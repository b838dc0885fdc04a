"""Minimal mock of the `carla` client API — enough to drive
sim/carla_env.CarlaDrivingEnv through reset/step/observe without a simulator.
Vehicle kinematics are a simple unicycle so expert control visibly moves it.
"""

from types import SimpleNamespace

import numpy as np


class _SensorData(SimpleNamespace):
    """Attribute-bag sensor payloads, typed so the vendored leaderboard
    CallBack's ``isinstance(data, carla.libcarla.Image)`` dispatch works."""


class Image(_SensorData):
    pass


class GnssMeasurement(_SensorData):
    pass


class IMUMeasurement(_SensorData):
    pass


class LidarMeasurement(_SensorData):
    pass


class SemanticLidarMeasurement(_SensorData):
    pass


class RadarMeasurement(_SensorData):
    pass


class LaneType:
    """Distinct sentinels mirroring carla.LaneType (srunner lane walks)."""

    Driving = "Driving"
    Sidewalk = "Sidewalk"
    Shoulder = "Shoulder"
    Parking = "Parking"
    Any = "Any"


class LaneChange:
    """Bit flags mirroring carla.LaneChange (route planners AND these against
    waypoint lane markings when placing lane-change graph links)."""

    NONE = 0
    Right = 1
    Left = 2
    Both = 3


class _Command(SimpleNamespace):
    """Batched-command stand-ins (carla.command.*); recorded, not executed."""

    def __init__(self, *args, **kwargs):
        super().__init__(args=args, **kwargs)


command = SimpleNamespace(
    DestroyActor=_Command,
    SetAutopilot=_Command,
    SpawnActor=_Command,
    SetVehicleLightState=_Command,
    FutureActor=object(),
)

libcarla = SimpleNamespace(
    Image=Image,
    GnssMeasurement=GnssMeasurement,
    IMUMeasurement=IMUMeasurement,
    LidarMeasurement=LidarMeasurement,
    SemanticLidarMeasurement=SemanticLidarMeasurement,
    RadarMeasurement=RadarMeasurement,
)


class Location:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        if isinstance(x, Location):  # copy-constructor, like real carla
            x, y, z = x.x, x.y, x.z
        self.x, self.y, self.z = float(x), float(y), float(z)

    def distance(self, other):
        return float(
            np.linalg.norm([self.x - other.x, self.y - other.y, self.z - other.z])
        )

    def __add__(self, other):
        return Location(self.x + other.x, self.y + other.y, self.z + other.z)

    def __sub__(self, other):
        return Location(self.x - other.x, self.y - other.y, self.z - other.z)


class Rotation:
    def __init__(self, pitch=0.0, yaw=0.0, roll=0.0):
        self.pitch, self.yaw, self.roll = float(pitch), float(yaw), float(roll)

    def get_forward_vector(self):
        # real carla.Rotation exposes this too (yaw-only is enough for the
        # flat-ground consumers exercised in tests)
        yaw = np.deg2rad(self.yaw)
        return SimpleNamespace(x=float(np.cos(yaw)), y=float(np.sin(yaw)), z=0.0)


class Transform:
    def __init__(self, location=None, rotation=None):
        self.location = location or Location()
        self.rotation = rotation or Rotation()

    def get_forward_vector(self):
        yaw = np.deg2rad(self.rotation.yaw)
        return SimpleNamespace(x=float(np.cos(yaw)), y=float(np.sin(yaw)), z=0.0)

    def transform(self, loc):
        """Local point -> world (yaw-only, like real carla for flat objects)."""
        yaw = np.deg2rad(self.rotation.yaw)
        c, s = np.cos(yaw), np.sin(yaw)
        return Location(
            self.location.x + c * loc.x - s * loc.y,
            self.location.y + s * loc.x + c * loc.y,
            self.location.z + loc.z,
        )


class VehicleControl:
    def __init__(self, throttle=0.0, steer=0.0, brake=0.0):
        self.throttle, self.steer, self.brake = throttle, steer, brake
        self.gear = 1


class Vector2D:
    def __init__(self, x=0.0, y=0.0):
        self.x, self.y = float(x), float(y)

    def __sub__(self, other):
        return Vector2D(self.x - other.x, self.y - other.y)

    def __add__(self, other):
        return Vector2D(self.x + other.x, self.y + other.y)


class Vector3D:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        if hasattr(x, "x"):  # copy-constructor, like real carla.Vector3D
            x, y, z = x.x, x.y, x.z
        self.x, self.y, self.z = float(x), float(y), float(z)

    def __mul__(self, s):
        return Vector3D(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def __add__(self, other):
        return Vector3D(self.x + other.x, self.y + other.y, self.z + other.z)

    def __sub__(self, other):
        return Vector3D(self.x - other.x, self.y - other.y, self.z - other.z)


class BoundingBox:
    """Oriented box (carla.BoundingBox): ``location`` is the center offset in
    the owner's frame (or a world-space center for level bbs), ``extent`` the
    half-sizes."""

    def __init__(self, location=None, extent=None, rotation=None):
        self.location = location if location is not None else Location()
        self.extent = extent if extent is not None else Vector3D()
        self.rotation = rotation if rotation is not None else Rotation()


class CityObjectLabel:
    """Semantic level-object classes (carla.CityObjectLabel; the reference
    birdview queries Vehicles/Pedestrians, chauffeurnet.py:139-140)."""

    Vehicles = "Vehicles"
    Pedestrians = "Pedestrians"


class WalkerControl:
    def __init__(self, direction=None, speed=0.0, jump=False):
        self.direction = direction or Vector3D()
        self.speed = float(speed)
        self.jump = jump


class _Blueprint:
    def __init__(self, bp_id):
        self.id = bp_id
        self.attrs = {}

    def set_attribute(self, k, v):
        self.attrs[k] = v

    def has_attribute(self, k):
        return k in self.attrs


class _BlueprintLibrary:
    def find(self, bp_id):
        return _Blueprint(bp_id)

    def filter(self, pattern):
        base = pattern.rstrip("*").rstrip(".")
        if "vehicle" in pattern:
            return [_Blueprint("vehicle.lincoln.mkz2017")]
        if "walker" in pattern:
            return [_Blueprint(base + ".0001" if base else "walker.pedestrian.0001")]
        return []


class _Vehicle:
    _next_id = 1

    def __init__(self, world, transform):
        self.id = _Vehicle._next_id
        _Vehicle._next_id += 1
        self.world = world
        self.transform = Transform(
            Location(transform.location.x, transform.location.y, transform.location.z),
            Rotation(yaw=transform.rotation.yaw),
        )
        self.speed = 0.0
        self.control = VehicleControl()
        self.type_id = "vehicle.lincoln.mkz2017"
        self.alive = True
        self.bounding_box = BoundingBox(extent=Vector3D(2.45, 1.06, 0.75))

    # --- carla.Vehicle surface
    def get_location(self):
        return self.transform.location

    def get_transform(self):
        return self.transform

    def get_velocity(self):
        yaw = np.deg2rad(self.transform.rotation.yaw)
        return SimpleNamespace(
            x=self.speed * np.cos(yaw), y=self.speed * np.sin(yaw), z=0.0
        )

    def get_acceleration(self):
        return SimpleNamespace(x=0.0, y=0.0, z=0.0)

    def get_angular_velocity(self):
        return SimpleNamespace(x=0.0, y=0.0, z=0.0)

    def get_control(self):
        return self.control

    def apply_control(self, control):
        self.control = control

    def is_at_traffic_light(self):
        return False

    def get_world(self):
        return self.world

    @property
    def is_alive(self):
        # srunner's CarlaDataProvider.on_carla_tick checks actor.is_alive
        return self.alive

    def destroy(self):
        self.alive = False

    def _physics(self, dt):
        c = self.control
        accel = 4.0 * c.throttle - 8.0 * c.brake - 0.2 * self.speed
        self.speed = max(0.0, self.speed + accel * dt)
        self.transform.rotation.yaw += np.degrees(c.steer * self.speed * 0.2 * dt)
        yaw = np.deg2rad(self.transform.rotation.yaw)
        self.transform.location.x += self.speed * dt * np.cos(yaw)
        self.transform.location.y += self.speed * dt * np.sin(yaw)


class _Sensor:
    def __init__(self, world, bp, parent):
        self.world = world
        self.bp = bp
        self.parent = parent
        self.callback = None
        self.id = _Vehicle._next_id
        _Vehicle._next_id += 1
        self.type_id = bp.id
        self.is_alive = True

    def listen(self, cb):
        self.callback = cb

    def stop(self):
        self.callback = None

    def destroy(self):
        pass

    def _emit(self, frame):
        if self.callback is None:
            return
        if self.bp.id == "sensor.camera.rgb":
            h = int(self.bp.attrs.get("image_size_y", 64))
            w = int(self.bp.attrs.get("image_size_x", 64))
            raw = np.zeros((h, w, 4), np.uint8)
            raw[..., :3] = 100
            self.callback(
                Image(frame=frame, height=h, width=w, raw_data=raw.tobytes())
            )
        elif self.bp.id == "sensor.other.imu":
            yaw = np.deg2rad(self.parent.transform.rotation.yaw)
            # accelerometer/gyroscope consumed by the vendored CallBack
            # (sensor_interface.py _parse_imu_cb); compass by both paths
            self.callback(
                IMUMeasurement(
                    frame=frame,
                    compass=float(yaw),
                    accelerometer=Vector3D(0.0, 0.0, 9.81),
                    gyroscope=Vector3D(0.0, 0.0, 0.0),
                )
            )
        elif self.bp.id == "sensor.other.gnss":
            # web-mercator gps consistent with the route plan conversion
            from autonomous_driving_with_diffusion_model_tpu.sim.route_planner import (
                location_to_gps,
            )

            loc = self.parent.get_location()
            lat, lon, z = location_to_gps(loc)
            # the vendored leaderboard CallBack reads transform.location (its
            # gnss array is [x, y, lat, lon, alt], sensor_interface.py:188-199)
            self.callback(
                GnssMeasurement(
                    frame=frame,
                    latitude=lat,
                    longitude=lon,
                    altitude=z,
                    transform=Transform(Location(loc.x, loc.y, loc.z)),
                )
            )
        elif self.bp.id == "sensor.other.collision":
            # contact = centers within 2 m (tests may also fire events manually)
            p = self.parent.get_location()
            dt = self.world.settings.fixed_delta_seconds or 0.1
            for a in self.world.actors:
                if a is self.parent or not a.type_id.startswith(
                    ("vehicle", "walker.pedestrian")
                ):
                    continue
                if not getattr(a, "alive", True):
                    continue
                o = a.get_location()
                if np.hypot(p.x - o.x, p.y - o.y) < 2.0:
                    self.callback(
                        SimpleNamespace(
                            frame=frame,
                            timestamp=frame * dt,
                            actor=self.parent,
                            other_actor=a,
                            normal_impulse=SimpleNamespace(x=1.0, y=0.0, z=0.0),
                        )
                    )


class _Walker:
    """Pedestrian: static unless driven via apply_control(WalkerControl)
    (AI controller stays a no-op)."""

    def __init__(self, world, transform, type_id="walker.pedestrian.0001"):
        self.id = _Vehicle._next_id
        _Vehicle._next_id += 1
        self.world = world
        self.type_id = type_id
        self.transform = Transform(
            Location(transform.location.x, transform.location.y, transform.location.z)
        )
        self.bounding_box = BoundingBox(extent=Vector3D(0.34, 0.34, 0.93))
        self.control = None
        self.alive = True

    def get_location(self):
        return self.transform.location

    def get_transform(self):
        return self.transform

    def get_velocity(self):
        if self.control is None or self.control.speed == 0.0:
            return SimpleNamespace(x=0.0, y=0.0, z=0.0)
        d = self.control.direction
        n = max(np.hypot(d.x, d.y), 1e-9)
        s = self.control.speed
        return SimpleNamespace(x=s * d.x / n, y=s * d.y / n, z=0.0)

    def apply_control(self, control):
        self.control = control

    def _physics(self, dt):
        if self.control is None or self.control.speed <= 0.0:
            return
        d = self.control.direction
        n = max(np.hypot(d.x, d.y), 1e-9)
        self.transform.location.x += self.control.speed * d.x / n * dt
        self.transform.location.y += self.control.speed * d.y / n * dt

    @property
    def is_alive(self):
        return self.alive

    def destroy(self):
        self.alive = False


class _WalkerController:
    def __init__(self, world, parent):
        self.id = _Vehicle._next_id
        _Vehicle._next_id += 1
        self.type_id = "controller.ai.walker"
        self.parent = parent
        self.started = False
        self.target = None
        self.max_speed = None

    def start(self):
        self.started = True

    def go_to_location(self, loc):
        self.target = loc

    def set_max_speed(self, s):
        self.max_speed = s

    def stop(self):
        self.started = False

    def destroy(self):
        pass


class _ActorList(list):
    def filter(self, pattern):
        key = pattern.strip("*")
        return _ActorList(a for a in self if key in a.type_id)


class _Settings(SimpleNamespace):
    pass


class Color:
    def __init__(self, r=0, g=0, b=0, a=255):
        self.r, self.g, self.b, self.a = r, g, b, a


class _DebugHelper:
    """Records draw calls (real carla renders them in the simulator)."""

    def __init__(self):
        self.strings = []
        self.points = []

    def draw_string(self, location, text, draw_shadow=False, color=None,
                    life_time=-1, persistent_lines=True):
        self.strings.append((location, text))

    def draw_point(self, location, size=0.1, color=None, life_time=-1):
        self.points.append((location, size))


class _World:
    def __init__(self):
        self.frame = 0
        self.settings = _Settings(synchronous_mode=False, fixed_delta_seconds=None)
        self.actors = _ActorList()
        self.sensors = []
        self.weather = SimpleNamespace()
        self._map = _Map()
        self.debug = _DebugHelper()

    def get_settings(self):
        return self.settings

    def apply_settings(self, s):
        self.settings = s

    def get_map(self):
        return self._map

    def get_blueprint_library(self):
        return _BlueprintLibrary()

    def spawn_actor(self, bp, transform, attach_to=None):
        if bp.id.startswith("vehicle"):
            actor = _Vehicle(self, transform)
            self.actors.append(actor)
            return actor
        if bp.id.startswith("walker"):
            walker = _Walker(self, transform, type_id=bp.id)
            self.actors.append(walker)
            return walker
        if bp.id == "controller.ai.walker":
            ctrl = _WalkerController(self, attach_to)
            self.actors.append(ctrl)
            return ctrl
        sensor = _Sensor(self, bp, attach_to)
        self.sensors.append(sensor)
        self.actors.append(sensor)
        return sensor

    def get_random_location_from_navigation(self):
        # deterministic sidewalk points along the road (y=3, off the lane)
        self._nav_i = getattr(self, "_nav_i", 0) + 1
        return Location(x=float((self._nav_i * 17) % 140), y=3.0, z=0.0)

    def tick(self, timeout=None):
        self.frame += 1
        dt = self.settings.fixed_delta_seconds or 0.1
        for a in self.actors:
            if isinstance(a, (_Vehicle, _Walker)):
                a._physics(dt)
        for s in self.sensors:
            s._emit(self.frame)
        return self.frame

    def get_snapshot(self):
        # .timestamp consumed by the vendored ScenarioManager/GameTime.
        # delta_seconds passes through a C++ float in real CARLA, so 0.05
        # arrives as 0.05000000074505806 — strictly greater than the
        # SpeedometerReader's float64 1/frame_rate threshold, which is what
        # makes it deliver EVERY frame. Reproduce that semantics.
        dt = float(np.float32(self.settings.fixed_delta_seconds or 0.1))
        return SimpleNamespace(
            frame=self.frame,
            timestamp=SimpleNamespace(
                frame=self.frame,
                elapsed_seconds=self.frame * dt,
                delta_seconds=dt,
                platform_timestamp=0.0,
            ),
        )

    def get_spectator(self):
        if not hasattr(self, "_spectator"):
            self._spectator = SimpleNamespace(
                transform=Transform(),
                set_transform=lambda t: setattr(self._spectator, "transform", t),
                get_transform=lambda: self._spectator.transform,
            )
        return self._spectator

    def get_actors(self):
        return self.actors

    def get_level_bbs(self, label):
        """World-space bounding boxes of all level objects of one semantic
        class (carla.World.get_level_bbs; the reference birdview feeds on
        Vehicles/Pedestrians, chauffeurnet.py:139-140). Derived from the live
        actors: center at the actor's transform composed with the local bbox
        offset, the actor's rotation, the actor's half-extents."""
        kind = _Vehicle if label == CityObjectLabel.Vehicles else _Walker
        out = []
        for a in self.actors:
            if not (isinstance(a, kind) and a.is_alive):
                continue
            tf = a.get_transform()
            bb = a.bounding_box
            out.append(
                BoundingBox(
                    location=tf.transform(bb.location),
                    extent=Vector3D(bb.extent),
                    rotation=Rotation(yaw=tf.rotation.yaw),
                )
            )
        return out

    def get_weather(self):
        return self.weather

    def set_weather(self, w):
        self.weather = w


JUNCTION_X = (62.0, 75.0)  # the mock town: one road along +x with one junction
LANE_WIDTH = 3.5


ROAD_END = 150.0


class Waypoint:
    """Waypoint on the mock's single straight road (y=0, heading +x).

    ``lane_type``/``get_right_lane`` model a driving lane directly beside the
    sidewalk (the srunner DynamicObjectCrossing lane walk,
    object_crash_vehicle.py:309-325)."""

    lane_type = LaneType.Driving
    # solid single-lane road: no lane changes permitted anywhere (both the
    # first-party and the reference global route planners AND these markings
    # against carla.LaneChange when placing zero-cost lane-change links)
    right_lane_marking = SimpleNamespace(lane_change=LaneChange.NONE)
    left_lane_marking = SimpleNamespace(lane_change=LaneChange.NONE)

    def __init__(self, x, y=0.0):
        self.x = float(x)
        self.y = float(y)
        self.is_junction = JUNCTION_X[0] <= x < JUNCTION_X[1]
        self.is_intersection = self.is_junction
        self.road_id = 2 if self.is_junction else (1 if x < JUNCTION_X[0] else 3)
        self.section_id = 0
        self.lane_id = -1
        self.lane_width = LANE_WIDTH
        self.transform = Transform(Location(x=self.x, y=self.y), Rotation(yaw=0.0))

    def next(self, d):
        return [type(self)(self.x + d, self.y)]

    def previous(self, d):
        return [type(self)(self.x - d, self.y)]

    def get_right_lane(self):
        return _SidewalkWaypoint(self.x, self.y + LANE_WIDTH)

    def get_left_lane(self):
        # the opposite driving lane (srunner ManeuverOppositeDirection
        # places its oncoming vehicle there)
        return Waypoint(self.x, self.y - LANE_WIDTH)


class _SidewalkWaypoint(Waypoint):
    lane_type = LaneType.Sidewalk

    def get_right_lane(self):
        return None


class _Map:
    name = "Town01"  # carla.Map.name; the reference birdview resolves
    # its cached global-mask h5 as maps/<name>.h5 (chauffeurnet.py:81)

    def get_spawn_points(self):
        return [
            Transform(Location(x=float(i * 10), y=0.0), Rotation(yaw=0.0))
            for i in range(10)
        ]

    def get_waypoint(self, location, lane_type=None, project_to_road=True):
        if lane_type is not None and lane_type == LaneType.Parking:
            return None  # mock town has no parking lanes
        return Waypoint(location.x)

    def get_topology(self):
        """Lane-segment graph: road 1 -> junction road 2 -> road 3."""
        return [
            (Waypoint(0.0), Waypoint(JUNCTION_X[0])),
            (Waypoint(JUNCTION_X[0]), Waypoint(JUNCTION_X[1])),
            (Waypoint(JUNCTION_X[1]), Waypoint(ROAD_END)),
        ]


class TrafficLight:
    """Traffic light at the junction entrance; trigger volume spans the lane."""

    def __init__(self, x=57.0, state="Red", extent_x=1.5):
        self.id = _Vehicle._next_id
        _Vehicle._next_id += 1
        self.type_id = "traffic.traffic_light"
        self.state = state
        self._transform = Transform(Location(x=float(x), y=0.0), Rotation(yaw=0.0))
        self.trigger_volume = SimpleNamespace(
            location=Location(0.0, 0.0, 0.0),
            extent=SimpleNamespace(x=float(extent_x), y=2.0, z=1.0),
        )

    def get_transform(self):
        return self._transform

    def get_location(self):
        return self._transform.location

    def destroy(self):
        pass


class StopSign:
    def __init__(self, x=40.0, extent=2.0):
        self.id = _Vehicle._next_id
        _Vehicle._next_id += 1
        self.type_id = "traffic.stop"
        self._transform = Transform(Location(x=float(x), y=0.0), Rotation(yaw=0.0))
        self.trigger_volume = SimpleNamespace(
            location=Location(0.0, 0.0, 0.0),
            extent=SimpleNamespace(x=float(extent), y=float(extent), z=1.0),
        )

    def get_transform(self):
        return self._transform

    def get_location(self):
        return self._transform.location

    def destroy(self):
        pass


class _TrafficManager:
    def __init__(self, port=8000):
        self._port = port

    def get_port(self):
        return self._port

    def set_synchronous_mode(self, on):
        self.synchronous = on

    def set_global_distance_to_leading_vehicle(self, d):
        pass

    def set_hybrid_physics_mode(self, on=True):
        pass

    def set_random_device_seed(self, seed):
        pass


class Client:
    def __init__(self, host, port):
        self._world = _World()

    def set_timeout(self, t):
        pass

    def get_world(self):
        return self._world

    def load_world(self, town):
        return self._world

    def get_trafficmanager(self, port=8000):
        return _TrafficManager(port)

    def apply_batch(self, batch):
        pass

    def apply_batch_sync(self, batch):
        return []


class WeatherParameters(SimpleNamespace):
    """Callable like the real carla.WeatherParameters; named presets are
    class attributes (only ClearNoon is populated)."""

    ClearNoon = None  # filled in below (needs the class to exist first)


for _preset in (
    "ClearNoon", "ClearSunset", "CloudyNoon", "CloudySunset", "WetNoon",
    "WetSunset", "MidRainyNoon", "MidRainSunset", "WetCloudyNoon",
    "WetCloudySunset", "HardRainNoon", "HardRainSunset", "SoftRainNoon",
    "SoftRainSunset",
):
    setattr(WeatherParameters, _preset, WeatherParameters())
TrafficLightState = SimpleNamespace(Red="Red", Yellow="Yellow", Green="Green")
