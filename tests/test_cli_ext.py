"""External CLI orientation / affine-shape estimators
(reference DetectOrientationExt / DetectAffineShapeExt,
synth-detection.cpp:931-1038, 1152-1244) driven by mock tools."""
import os
import stat
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mods_tpu.desc.cli_desc import affine_shape_with_cli, orient_with_cli
from mods_tpu.types import Keypoints


def _mock_tool(tmp_path, name, body):
    """Create an executable `tool <in.bmp> <out.txt>` writing `body`
    computed from the patch count."""
    path = tmp_path / name
    path.write_text(
        "#!/usr/bin/env python\n"
        "import sys, cv2\n"
        "img = cv2.imread(sys.argv[1], cv2.IMREAD_GRAYSCALE)\n"
        "n = img.shape[0] // img.shape[1]\n"
        "with open(sys.argv[2], 'w') as f:\n"
        f"    f.write(' '.join(({body!r}) for _ in range(n)))\n")
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


def _keypoints():
    xy = jnp.asarray([[40.0, 44.0], [60.0, 50.0], [30.0, 70.0]])
    A = jnp.asarray([np.eye(2)] * 3, jnp.float32)
    s = jnp.asarray([2.0, 3.0, 2.5])
    return Keypoints(xy, A, s, jnp.zeros(3), jnp.ones(3, bool))


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0, 255, (100, 120)).astype(np.float32))


def test_orient_with_cli(img, tmp_path):
    tool = _mock_tool(tmp_path, "oritool.py", "0.5")
    kp = _keypoints()
    out = orient_with_cli(img, kp, f"python {tool}", mr_size=5.1962,
                          patch_size=32)
    ci, si = np.cos(-0.5), np.sin(-0.5)
    # reference rotation update (synth-detection.cpp:1017-1020)
    expect = np.array([[ci, si], [-si, ci]], np.float32)
    A = np.asarray(out.A)
    v = np.asarray(out.valid)
    assert v.sum() >= 1
    for i in np.where(v)[0]:
        np.testing.assert_allclose(A[i], expect, atol=1e-5)


def test_affine_shape_with_cli(img, tmp_path):
    tool = _mock_tool(tmp_path, "afftool.py", "1.2 0.0 0.0 0.8")
    kp = _keypoints()
    out = affine_shape_with_cli(img, kp, f"python {tool}", mr_size=3.0,
                                patch_size=41)
    v = np.asarray(out.valid)
    assert v.sum() >= 1
    s1 = np.sqrt(abs(1.2 * 0.8 - 1.2 * 0.0))
    np.testing.assert_allclose(np.asarray(out.s)[v],
                               np.asarray(kp.s)[v] * s1, rtol=1e-5)
    # rectified up-is-up of diag(1.2, 0.8): stays diagonal, unit det
    # (helpers.cpp:380-409 divides by sqrt(det); scale rides in s)
    d = np.sqrt(1.2 * 0.8)
    A = np.asarray(out.A)
    for i in np.where(v)[0]:
        np.testing.assert_allclose(A[i], np.diag([1.2 / d, 0.8 / d]),
                                   atol=1e-4)
