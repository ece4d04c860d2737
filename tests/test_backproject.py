import jax.numpy as jnp
import numpy as np

from holoagent_tpu.ops.backproject import backproject, backproject_batch, mean_depth_gate
from holoagent_tpu.utils.camera import Pinhole, project
from holoagent_tpu.utils.geometry import invert_pose


def _cam():
    return Pinhole.make(fx=100.0, fy=100.0, cx=32.0, cy=24.0)


def test_backproject_roundtrip(rng):
    h, w = 48, 64
    cam = _cam()
    depth = rng.uniform(0.5, 5.0, size=(h, w)).astype(np.float32)
    rgb = rng.uniform(size=(h, w, 3)).astype(np.float32)
    # a nontrivial pose
    theta = 0.3
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
        np.float32,
    )
    pose[:3, 3] = [1.0, -2.0, 0.5]
    pts, cols, valid = backproject(jnp.asarray(depth), jnp.asarray(rgb), cam, jnp.asarray(pose))
    assert bool(valid.all())
    # project back into the camera: must recover pixel coords and depth
    pts_cam = np.asarray(pts) @ pose[:3, :3] - pose[:3, :3].T @ pose[:3, 3]
    pix, z = project(jnp.asarray(pts_cam.astype(np.float32)), cam)
    v, u = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    np.testing.assert_allclose(np.asarray(z).reshape(h, w), depth, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pix)[:, 0].reshape(h, w), u, atol=1e-2)
    np.testing.assert_allclose(np.asarray(pix)[:, 1].reshape(h, w), v, atol=1e-2)
    np.testing.assert_allclose(np.asarray(cols), rgb.reshape(-1, 3))


def test_backproject_invalid_depth():
    h, w = 8, 8
    depth = np.full((h, w), 20.0, np.float32)  # beyond depth_max
    depth[0, 0] = 1.0
    pts, cols, valid = backproject(
        jnp.asarray(depth),
        jnp.zeros((h, w, 3), np.float32),
        _cam(),
        jnp.eye(4, dtype=jnp.float32),
        1e-3,
        10.0,
    )
    v = np.asarray(valid)
    assert v.sum() == 1 and v[0]
    assert not bool(mean_depth_gate(jnp.asarray(depth), jnp.asarray(np.ones((h * w,), bool)), 10.0))


def test_backproject_batch(rng):
    b, h, w = 3, 16, 16
    depth = rng.uniform(0.5, 5.0, size=(b, h, w)).astype(np.float32)
    rgb = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    pts, cols, valid = backproject_batch(
        jnp.asarray(depth), jnp.asarray(rgb), _cam(), jnp.asarray(poses), 1e-3, 10.0
    )
    assert pts.shape == (b, h * w, 3)
    assert bool(valid.all())


def test_invert_pose(rng):
    from holoagent_tpu.utils.geometry import exp_se3

    xi = rng.normal(0, 0.5, size=(5, 6)).astype(np.float32)
    poses = exp_se3(jnp.asarray(xi))
    inv = invert_pose(poses)
    eye = np.asarray(poses) @ np.asarray(inv)
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (5, 1, 1)), atol=1e-5)
