"""PNG asset overlay + recorded-fixture pixel diff (VERDICT.md next #5).

The overlay is exercised against a synthetic assets/ tree (the real
reference assets are not redistributed); the fixture diff is exercised
as a round trip through the engine itself, which validates the whole
record -> replay -> compare pipeline bit-exactly.
"""
import os

import numpy as np
import pytest

from procgen2_tpu.render import atlas, png_assets


@pytest.fixture
def fake_assets(tmp_path):
    """A tiny fake reference assets/ tree with two mapped PNGs."""
    from PIL import Image

    # solid magenta cheese, solid cyan coin
    paths = {
        "misc_assets/cheese.png": (255, 0, 255, 255),
        "kenney/Items/coinGold.png": (0, 255, 255, 255),
        "topdown_backgrounds/floortiles.png": (10, 200, 30, 255),
    }
    for rel, color in paths.items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.new("RGBA", (96, 96), color).save(p)
    return str(tmp_path)


def test_overlay_install_uninstall(fake_assets):
    try:
        installed = png_assets.install(fake_assets)
        assert "cheese" in installed and "coin" in installed
        assert "backgrounds:topdown" in installed
        # atlas rebuild picks up the override
        imgs, index = atlas.build_atlas(("cheese", "coin", "maze_wall"))
        assert (imgs[index["cheese"]][..., :3] == [255, 0, 255]).all()
        assert (imgs[index["coin"]][..., :3] == [0, 255, 255]).all()
        # unmapped-or-missing sprite keeps procedural art (not solid color)
        assert len(np.unique(imgs[index["maze_wall"]][..., 0])) > 1
        # background overlay tiles modulo the supplied file count
        bgs = atlas.build_backgrounds("topdown", 9)
        assert bgs.shape == (9, atlas.BG_SIZE, atlas.BG_SIZE, 3)
        assert (bgs[0] == [10, 200, 30]).all() and (bgs[8] == [10, 200, 30]).all()
    finally:
        png_assets.uninstall()
    imgs2, index2 = atlas.build_atlas(("cheese",))
    assert not (imgs2[index2["cheese"]][..., :3] == [255, 0, 255]).all()
    assert "topdown" not in atlas._BG_OVERLAY


def test_default_mapping_names_are_registered():
    """Every mapping key must be a real registry sprite (guards doc rot)."""
    unknown = [n for n in png_assets.default_mapping() if n not in atlas._REGISTRY]
    assert unknown == []


def test_fixture_roundtrip_pixel_diff(tmp_path):
    """record -> replay -> compare on the engine itself: a fixture written
    from our own maze trajectory on a reference-oracle level must replay
    with 100% reward/termination agreement and zero pixel difference."""
    import jax
    import jax.numpy as jnp

    from procgen2_tpu import make
    from procgen2_tpu.tools.difference import compare_frames, run_fixture_diff
    from procgen2_tpu.tools.reference_levels import reference_bank

    seed, steps = 7, 12
    env = make("maze", mode="easy")
    bank = jax.tree.map(jnp.asarray, reference_bank("maze", [seed], mode="easy"))
    state, ts = env.reset(bank, jax.random.key(seed), num_envs=1)
    rng = np.random.default_rng(seed)
    actions, frames, rewards, terms = [], [], [], []
    for _ in range(steps):
        a = int(rng.integers(0, 15))
        state, ts = env.step(bank, state, jnp.array([a], jnp.int32))
        actions.append(a)
        frames.append(np.asarray(ts.obs[0]))
        rewards.append(float(ts.reward[0]))
        terms.append(bool(ts.terminated[0]))
    fx = tmp_path / "maze_fixture.npz"
    np.savez_compressed(
        fx, game="maze", seed=seed,
        actions=np.asarray(actions, np.int32),
        frames=np.stack(frames).astype(np.uint8),
        rewards=np.asarray(rewards, np.float32),
        terminated=np.asarray(terms, bool),
    )

    rep = run_fixture_diff(str(fx), mode="easy")
    assert rep["reward_agreement"] == 1.0
    assert rep["termination_agreement"] == 1.0
    assert rep["pixel"].mean_abs_diff == 0.0
    assert rep["pixel"].fraction_within_8 == 1.0


def test_signed_diff_image():
    from procgen2_tpu.tools.difference import signed_diff_image

    a = np.full((2, 2, 3), 200, np.uint8)
    b = np.full((2, 2, 3), 100, np.uint8)
    d = signed_diff_image(a, b)
    assert (d > 127).all()  # positive difference maps above mid-grey
    assert (signed_diff_image(b, a) < 128).all()
