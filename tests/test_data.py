"""Data pipeline tests: dataset contract, loader, on-device augmentation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autonomous_driving_with_diffusion_model_tpu.data import (
    Loader,
    TrajDataset,
    augment_batch,
    augment_factors,
    normalize_images,
)


@pytest.fixture
def fake_root(tmp_path, rng):
    import cv2

    root = tmp_path / "data"
    (root / "front").mkdir(parents=True)
    (root / "waypoints").mkdir()
    n = 10
    for i in range(n):
        img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "front" / f"{i:06d}.png"), img)
        lines = [" ".join(f"{v:.6f}" for v in rng.standard_normal(2))]
        for _ in range(16):
            lines.append(" ".join(f"{v:.6f}" for v in rng.standard_normal(7) * 2))
        (root / "waypoints" / f"{i:06d}.txt").write_text("\n".join(lines) + "\n")
    return str(root)


def test_dataset_contract(fake_root):
    ds = TrajDataset(fake_root)
    assert len(ds) == 10
    item = ds[3]
    assert item["image"].shape == (32, 48, 3) and item["image"].dtype == np.uint8
    assert item["trajs"].shape == (16, 7)
    assert np.abs(item["trajs"]).max() <= 1.0  # clipped like carla_dataset.py:40
    assert item["target"].shape == (2,)


def test_loader_shuffle_droplast(fake_root):
    ds = TrajDataset(fake_root)
    loader = Loader(ds, batch_size=4, shuffle=True, drop_last=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # 10 // 4, drop_last
    assert batches[0]["image"].shape == (4, 32, 48, 3)
    assert batches[0]["trajs"].shape == (4, 16, 7)
    # different epochs shuffle differently
    b2 = list(loader)
    assert not np.array_equal(batches[0]["image"], b2[0]["image"])


def test_augment_factors_anneal():
    f0 = augment_factors(jnp.asarray(0.0))
    f_late = augment_factors(jnp.asarray(32.0 * 400000.0))
    assert float(f0["frequency"]) == pytest.approx(0.05)
    assert float(f_late["frequency"]) == pytest.approx(0.5)
    assert float(f0["color"]) == 0.0
    # dropout factor grows from ~0.0386 toward the 0.198667 asymptote
    assert float(f0["dropout"]) == pytest.approx(0.03856658, rel=1e-3)
    assert float(f_late["dropout"]) > float(f0["dropout"])


def test_augment_batch_shapes_and_range(rng):
    imgs = jnp.asarray(rng.integers(0, 255, (4, 32, 48, 3)), jnp.uint8)
    out = jax.jit(augment_batch)(imgs, jax.random.PRNGKey(0), jnp.asarray(32.0 * 100000.0))
    out = np.asarray(out)
    assert out.shape == (4, 32, 48, 3)
    assert out.min() >= 0.0 and out.max() <= 255.0
    # with late-iteration frequency 0.5, at least one image must change
    assert not np.allclose(out, np.asarray(imgs, np.float32))


def test_augment_deterministic_per_key(rng):
    imgs = jnp.asarray(rng.integers(0, 255, (2, 32, 48, 3)), jnp.uint8)
    a = augment_batch(imgs, jax.random.PRNGKey(5), jnp.asarray(1e6))
    b = augment_batch(imgs, jax.random.PRNGKey(5), jnp.asarray(1e6))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_normalize_matches_torchvision_semantics(rng):
    """ToTensor (/255) + Normalize(ImageNet) (reference: train.py:156-161);
    torchvision itself isn't in the image, so the formula is inlined."""
    img = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (img.astype(np.float32) / 255.0 - mean) / std
    out = normalize_images(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_loader_per_host_sharding(fake_root):
    """Multi-host input sharding: same (seed, epoch) shuffle on every host,
    disjoint strides, deterministic across epochs."""
    from autonomous_driving_with_diffusion_model_tpu.data.dataset import Loader

    loaders = [
        Loader(
            TrajDataset(fake_root), batch_size=2, shuffle=True, num_workers=1,
            seed=7, shard_index=i, shard_count=2,
        )
        for i in range(2)
    ]
    assert len(loaders[0]) == 2  # 10 items / 2 hosts / batch 2 (drop_last)

    def epoch_targets(loader):
        return np.concatenate([b["target"] for b in loader], axis=0)

    a0 = epoch_targets(loaders[0])
    b0 = epoch_targets(loaders[1])
    # disjoint shards (targets are unique random rows in the fixture)
    a_rows = {tuple(r) for r in a0.round(5)}
    b_rows = {tuple(r) for r in b0.round(5)}
    assert not (a_rows & b_rows)
    assert len(a_rows | b_rows) >= 8  # union covers (nearly) the dataset

    # determinism: rebuild and replay epoch 0
    fresh = Loader(
        TrajDataset(fake_root), batch_size=2, shuffle=True, num_workers=1,
        seed=7, shard_index=0, shard_count=2,
    )
    np.testing.assert_array_equal(epoch_targets(fresh), a0)


def test_device_resident_loader_matches_host_loader(fake_root):
    """DeviceResidentLoader yields the same batches in the same order as the
    host loader it wraps (same _epoch_indices stream), with on-device
    gathers (round 4: removes per-step bulk transfers; also the workaround
    for the axon tunnel's per-transfer staging-buffer leak)."""
    from autonomous_driving_with_diffusion_model_tpu.data.dataset import (
        DeviceResidentLoader,
        Loader,
        TrajDataset,
    )

    host = Loader(TrajDataset(fake_root), batch_size=4, seed=3, num_workers=2)
    dev = DeviceResidentLoader(
        Loader(TrajDataset(fake_root), batch_size=4, seed=3, num_workers=2)
    )
    assert len(dev) == len(host)
    for hb, db in zip(host, dev):
        assert isinstance(db["image"], jnp.ndarray)
        np.testing.assert_array_equal(hb["image"], np.asarray(db["image"]))
        np.testing.assert_allclose(hb["trajs"], np.asarray(db["trajs"]))
        np.testing.assert_allclose(hb["target"], np.asarray(db["target"]))
    # second epoch advances the shared shuffle stream identically
    for hb, db in zip(host, dev):
        np.testing.assert_array_equal(hb["image"], np.asarray(db["image"]))
