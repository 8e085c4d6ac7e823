import jax.numpy as jnp
import numpy as np

from slam2d_tpu.config import GridConfig, MatcherConfig, SensorConfig
from slam2d_tpu.data.synth import SynthWorld
from slam2d_tpu.grid.occupancy import make_grid, raycast_update
from slam2d_tpu.match.correlative import (
    build_search_space,
    coarse_space,
    match_scan,
)

GCFG = GridConfig(height=256, width=256, resolution=0.1, ray_samples=128,
                  center_x=10.0, center_y=10.0)
SENSOR = SensorConfig(n_beams=90, max_range=10.0)
MCFG = MatcherConfig(search_xy=0.8, search_theta=0.25, n_theta=21)


def _world_scan(world, pose):
    angles = np.asarray(SENSOR.beam_angles())
    return jnp.asarray(world.raycast(np.asarray(pose), angles, SENSOR.max_range),
                       jnp.float32)


def _map_from_scans(world, poses):
    grid = make_grid(GCFG)
    for p in poses:
        r = _world_scan(world, p)
        grid = raycast_update(grid, jnp.asarray(p, jnp.float32), r, GCFG, SENSOR)
    return grid


def test_search_space_range_and_peak():
    world = SynthWorld.box_rooms(20.0)
    # integrate the same viewpoint several times so walls reach full evidence
    grid = _map_from_scans(world, [[10.0, 10.0, 0.0]] * 4)
    S = build_search_space(grid, MCFG, GCFG.resolution)
    s = np.asarray(S)
    assert s.min() >= -MCFG.free_penalty - 1e-6
    assert s.max() <= 1.0 + 1e-6
    assert s.max() > 0.9          # established walls blur to a peak of ~1
    assert s.min() < -0.2         # known-free space is penalized


def test_coarse_space_is_upper_bound():
    world = SynthWorld.box_rooms(20.0)
    grid = _map_from_scans(world, [[10.0, 10.0, 0.0]])
    S = np.asarray(build_search_space(grid, MCFG, GCFG.resolution))
    Sc = np.asarray(coarse_space(jnp.asarray(S), 4))
    f = 4
    for i in range(0, S.shape[0], 64):
        for j in range(0, S.shape[1], 64):
            assert Sc[i // f, j // f] >= S[i, j] - 1e-6


def test_match_recovers_known_offset():
    world = SynthWorld.box_rooms(20.0)
    true_pose = np.array([10.0, 10.0, 0.3])
    # map with accumulated evidence from several nearby viewpoints
    grid = _map_from_scans(
        world,
        [true_pose, [10.3, 10.1, 0.25], [9.8, 9.9, 0.4],
         true_pose, [10.3, 10.1, 0.25], [9.8, 9.9, 0.4]],
    )
    scan = _world_scan(world, true_pose)
    # perturb the prior and ask the matcher to undo it (prior penalty is
    # relative to the perturbed prior, so use a gentle weight here)
    import dataclasses
    mcfg = dataclasses.replace(MCFG, prior_xy_weight=0.2, prior_theta_weight=0.2)
    prior = jnp.asarray(true_pose + np.array([0.35, -0.30, 0.10]), jnp.float32)
    pose, score = match_scan(grid, scan, prior, GCFG, mcfg, SENSOR)
    pose = np.asarray(pose)
    assert float(score) > 0.4
    np.testing.assert_allclose(pose[:2], true_pose[:2], atol=0.12)
    assert abs(pose[2] - true_pose[2]) < 0.04


def test_match_empty_map_keeps_prior():
    grid = make_grid(GCFG)
    world = SynthWorld.box_rooms(20.0)
    scan = _world_scan(world, [10.0, 10.0, 0.0])
    prior = jnp.asarray([10.0, 10.0, 0.0], jnp.float32)
    pose, score = match_scan(grid, scan, prior, GCFG, MCFG, SENSOR)
    np.testing.assert_allclose(np.asarray(pose), np.asarray(prior), atol=1e-6)
    assert float(score) < MCFG.min_score
