"""Leaderboard route XML + scenario JSON parsing.

Reads the CARLA leaderboard route format (reference:
leaderboard/leaderboard/utils/route_parser.py; data under
leaderboard/data/evaluation_routes/*.xml) into plain dicts so the route
evaluator and agents can consume the published benchmark routes (e.g.
"Longest 6 tiny") directly, plus the scenario JSON keyed per town.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

__all__ = ["parse_routes_xml", "parse_scenarios_json", "route_length_m"]


def parse_routes_xml(path: str) -> List[Dict]:
    """-> [{"id", "town", "waypoints" (N, 3) xyz, "yaws" (N,), "length_m"}]."""
    tree = ET.parse(path)
    routes = []
    for route in tree.iter("route"):
        wps = []
        yaws = []
        for wp in route.iter("waypoint"):
            wps.append(
                [float(wp.attrib["x"]), float(wp.attrib["y"]), float(wp.attrib.get("z", 0.0))]
            )
            yaws.append(float(wp.attrib.get("yaw", 0.0)))
        waypoints = np.asarray(wps, np.float64)
        routes.append(
            {
                "id": route.attrib["id"],
                "town": route.attrib.get("town", ""),
                "waypoints": waypoints,
                "yaws": np.asarray(yaws, np.float64),
                "length_m": route_length_m(waypoints),
            }
        )
    return routes


def route_length_m(waypoints: np.ndarray) -> float:
    if len(waypoints) < 2:
        return 0.0
    return float(np.sum(np.linalg.norm(np.diff(waypoints[:, :2], axis=0), axis=1)))


def parse_scenarios_json(path: str, town: Optional[str] = None) -> List[Dict]:
    """Leaderboard scenario annotations (available_scenarios keyed per town)."""
    with open(path) as f:
        data = json.load(f)
    out = []
    for town_block in data.get("available_scenarios", []):
        for town_name, scenarios in town_block.items():
            if town is not None and town_name != town:
                continue
            for sc in scenarios:
                out.append({"town": town_name, **sc})
    return out
