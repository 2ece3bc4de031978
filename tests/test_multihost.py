"""Multi-host extract_features_batch demonstration (SURVEY §2.11).

Two simulated hosts split an image list with `--shard I/N` (the CLI's
multi-process data-parallel mode, parallel/distributed.shard_list); the
union of their outputs must be byte-identical to a single-host run.
Combined with skip-if-exists resume this is the reference
extract_features_batch.cpp:104-116 semantics scaled out.
"""
import os

import numpy as np
import pytest

from mods_tpu.cli import cmd_extract_batch


def _write_imgs(tmp, n=4):
    import cv2
    rng = np.random.default_rng(3)
    paths = []
    for i in range(n):
        img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
        # blobs so the detector finds real extrema
        for _ in range(30):
            c = (int(rng.uniform(8, 120)), int(rng.uniform(8, 88)))
            cv2.circle(img, c, int(rng.uniform(2, 9)),
                       float(rng.uniform(0, 255)), -1)
        p = os.path.join(tmp, f"im{i}.png")
        cv2.imwrite(p, np.clip(img, 0, 255).astype(np.uint8))
        paths.append(p)
    return paths


def _run_batch(tmp, imgs, outdir, shards):
    os.makedirs(outdir, exist_ok=True)
    outs = [os.path.join(outdir, os.path.basename(p) + ".npz") for p in imgs]
    li = os.path.join(outdir, "list_in.txt")
    lo = os.path.join(outdir, "list_out.txt")
    with open(li, "w") as fh:
        fh.write("\n".join(imgs))
    with open(lo, "w") as fh:
        fh.write("\n".join(outs))
    for i, n in shards:
        rc = cmd_extract_batch(
            [li, lo, "/root/reference/build/config_affori_classic.ini",
             "/root/reference/build/iters_HessianSIFT.ini",
             f"--shard={i}/{n}"])
        assert rc == 0
    return outs


def test_two_host_shards_match_single_host(tmp_path):
    tmp = str(tmp_path)
    imgs = _write_imgs(tmp)

    # single "host"
    outs1 = _run_batch(tmp, imgs, os.path.join(tmp, "single"), [(0, 1)])
    # two "hosts", each a strided partition of the same list
    outs2 = _run_batch(tmp, imgs, os.path.join(tmp, "sharded"),
                       [(0, 2), (1, 2)])

    for a, b in zip(outs1, outs2):
        assert os.path.exists(a) and os.path.exists(b), (a, b)
        za, zb = np.load(a), np.load(b)
        assert sorted(za.files) == sorted(zb.files)
        for k in za.files:
            np.testing.assert_array_equal(za[k], zb[k])

    # resume semantics: re-running a shard skips existing outputs
    before = {p: os.path.getmtime(p) for p in outs2}
    _run_batch(tmp, imgs, os.path.join(tmp, "sharded"), [(0, 2)])
    after = {p: os.path.getmtime(p) for p in outs2}
    assert before == after
