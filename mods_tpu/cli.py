"""Command-line apps mirroring the reference binaries.

  python -m mods_tpu.cli mods <img1> <img2> <out1> <out2> <k1> <k2> \
      <matchings> <log> [ver_type] [gt_h] [config.ini] [iters.ini]
      -- two-view matching (reference mods.cpp:49-544 CLI)

  python -m mods_tpu.cli extract <img> <out.npz> [config.ini] [iters.ini]
      -- single-image extraction (reference extract_features.cpp)

  python -m mods_tpu.cli extract_batch <image_list> <output_list> \
      [config.ini] [iters.ini]
      -- batch extraction with skip-if-exists resume
      (reference extract_features_batch.cpp:56-162)
"""
from __future__ import annotations

import json
import os
import sys
import time


def _load_gray(path: str):
    import cv2
    import numpy as np
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32).mean(axis=2)


_DEF_CFG = "/root/reference/build/config_affori_classic.ini"
_DEF_ITERS = "/root/reference/build/iters_HessianSIFT.ini"


def cmd_mods(argv):
    import numpy as np
    from .config import load_config
    from .twoview import match_images
    from .io.keys import read_h, write_h, write_matches

    # flags (extensions beyond the reference positional CLI)
    flags = {a for a in argv if a.startswith("--")}
    argv = [a for a in argv if not a.startswith("--")]
    do_clahe = "--clahe" in flags            # mods.cpp:133-181
    use_mask = "--mask" in flags             # mods-with-mask.cpp:109-198
    pre_extracted = "--pre-extracted" in flags  # mods.cpp:197-229

    img1p, img2p = argv[0], argv[1]
    out_args = argv[2:]
    out_img1 = out_args[0] if len(out_args) > 0 else ""
    out_img2 = out_args[1] if len(out_args) > 1 else ""
    k1 = out_args[2] if len(out_args) > 2 else "k1.txt"
    k2 = out_args[3] if len(out_args) > 3 else "k2.txt"
    m_out = out_args[4] if len(out_args) > 4 else "matches.txt"
    log_out = out_args[5] if len(out_args) > 5 else "log.txt"
    ver_type = out_args[6] if len(out_args) > 6 else "LORANSAC"
    gt_h_path = out_args[7] if len(out_args) > 7 else ""
    cfg_path = out_args[8] if len(out_args) > 8 else _DEF_CFG
    iters_path = out_args[9] if len(out_args) > 9 else _DEF_ITERS

    cfg = load_config(cfg_path, iters_path)
    if pre_extracted:
        # read_pre_extracted: img args are saved-feature files; maxSteps=1
        # (mods.cpp:197-229)
        from .io.keys import load_npz, load_oxaff
        load = lambda p: load_npz(p) if p.endswith(".npz") else load_oxaff(p)
        pre_feats = (load(img1p), load(img2p))
        img1 = img2 = np.zeros((16, 16), np.float32)
    else:
        pre_feats = None
        img1 = _load_gray(img1p)
        img2 = _load_gray(img2p)
        if do_clahe:
            import cv2
            clahe = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(8, 8))
            img1 = clahe.apply(np.clip(img1, 0, 255).astype(np.uint8)).astype(np.float32)
            img2 = clahe.apply(np.clip(img2, 0, 255).astype(np.uint8)).astype(np.float32)
        if use_mask:
            import cv2
            for i, p in enumerate([img1p, img2p]):
                mp = os.path.splitext(p)[0] + "_mask.png"
                if os.path.exists(mp):
                    m = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
                    if m is not None and m.shape == (img1, img2)[i].shape:
                        tgt = (img1, img2)[i]
                        tgt[m == 0] = 0.0
    H_gt = read_h(gt_h_path) if gt_h_path and os.path.exists(gt_h_path) else None
    t0 = time.time()
    r = match_images(img1, img2, cfg, H_gt=H_gt, ver_type=ver_type,
                     pre_extracted=pre_feats)
    total = time.time() - t0
    if out_img1 and r.final is not None:
        import cv2
        from .io.draw import draw_matches
        vis = draw_matches(img1, img2, r.final.tentatives, H=r.H,
                           is_f=ver_type in ("LORANSACF", "ORSA"))
        cv2.imwrite(out_img1, vis)
    if out_img2 and r.final is not None:
        # per-image annotated output (reference out2: matched regions
        # drawn on image 2)
        import cv2
        import numpy as np
        from .io.draw import draw_regions
        from .types import Features, Keypoints
        t = r.final.tentatives
        kp2 = Keypoints(xy=t.xy2, A=t.A2, s=t.s2,
                        response=np.zeros(int(t.m), np.float32),
                        valid=t.valid)
        f2vis = Features(det=kp2, reproj=kp2,
                         desc=np.zeros((int(t.m), 1), np.float32))
        cv2.imwrite(out_img2, draw_regions(img2, f2vis))

    print(f"{r.tentatives} tentatives found.")
    print(f"{r.unique_tentatives} unique tentatives left")
    print(f"{r.inliers} RANSAC correspondences got")
    print(f"Done in {r.steps_done} iterations")
    print("Image1: regions descriptors | Image2: regions descriptors")
    print(f"{r.regions1} {r.descriptors1} | {r.regions2} {r.descriptors2}")
    print("True matches | unique tentatives")
    ratio = 100.0 * r.inlier_ratio
    print(f"{r.inliers} | {r.unique_tentatives} | {ratio:.1f}%  1st geom inc")
    tl = r.timelog
    print("Timings: Synth|Detect|Orient|Desc|Match|RANSAC|Misc|Total")
    print(f"{tl.SynthTime:.3g} {tl.DetectTime:.3g} {tl.OrientTime:.3g} "
          f"{tl.DescTime:.3g} {tl.MatchTime:.3g} {tl.RANSACTime:.3g} "
          f"{tl.MiscTime:.3g} {total:.3g}")
    if r.H is not None:
        write_h(log_out + ".h", r.H)
    if r.final is not None:
        import numpy as np
        from .io.keys import write_matches_csv
        t = r.final.tentatives
        v = np.asarray(t.valid)
        write_matches(m_out, np.asarray(t.xy1)[v], np.asarray(t.xy2)[v],
                      np.asarray(t.ratio)[v])
        # CSV variant with FGINN/SNN ratios (WriteMatchings
        # writeWithRatios, matching.cpp:2596-2608)
        write_matches_csv(m_out + ".csv", np.asarray(t.xy1)[v],
                          np.asarray(t.xy2)[v], np.asarray(t.ratio)[v])
    # k1/k2 keypoint files in the native hierarchical format
    # (reference SaveRegions, mods.cpp:404-420 writing path)
    from .io.keys import save_regions_native
    from .twoview import _concat_features
    for rep, path in ((r.rep1, k1), (r.rep2, k2)):
        if rep is None or not path:
            continue
        store = {det: {dn: _concat_features(fl) for dn, fl in dmap.items()
                       if fl}
                 for det, dmap in rep.store.items()}
        save_regions_native(path, store)
    from .io.logs import write_log, write_time_log
    with open(log_out, "w") as fh:
        # reference io_mods WriteLog line (io_mods.cpp:10-67) ...
        write_log(r, ver_type, total, fh)
        # ... plus a JSON record (extension)
        fh.write(json.dumps(dict(
            tentatives=r.tentatives, unique=r.unique_tentatives,
            inliers=r.inliers, inlier_ratio=r.inlier_ratio,
            regions1=r.regions1, regions2=r.regions2,
            descriptors1=r.descriptors1, descriptors2=r.descriptors2,
            steps=r.steps_done, total_time_s=total)) + "\n")
    with open(log_out + ".time", "w") as fh:
        write_time_log(r.timelog, total, fh)
    return 0


def _extract_one(img, cfg):
    import numpy as np
    from .pipeline import extract_view
    h, w = img.shape
    step = cfg.iters[0] if cfg.iters else None
    feats = {}
    if step is None:
        from .config import IterationStep
        vf = extract_view(img, np.eye(3), w, h, cfg, "HessianAffine",
                          ["RootSIFT"])
        return vf
    det = next(iter(step.detectors))
    sched = step.detectors[det]
    vf = extract_view(img, np.eye(3), w, h, cfg, det, sched["descriptors"])
    return vf


def cmd_extract(argv):
    from .config import load_config
    from .io.keys import (save_npz, save_oxaff, save_regions_benchmark,
                          save_descriptors_benchmark)
    bench_prefix = None
    for a in list(argv):
        if a.startswith("--benchmark-out"):
            argv.remove(a)
            bench_prefix = a.split("=", 1)[1] if "=" in a else "bench"
    img_p, out_p = argv[0], argv[1]
    cfg = load_config(argv[2] if len(argv) > 2 else _DEF_CFG,
                      argv[3] if len(argv) > 3 else _DEF_ITERS)
    img = _load_gray(img_p)
    vf = _extract_one(img, cfg)
    f = next(iter(vf.by_desc.values()))
    if out_p.endswith(".npz"):
        save_npz(out_p, f)
    else:
        save_oxaff(out_p, f)
    if bench_prefix:
        # OxAff evaluation-protocol splits (SaveRegionsBenchmark /
        # SaveDescriptorsBenchmark, imagerepresentation.cpp:1515-1603)
        store = {"Det": {"None": [vf.regions], **{k: [v] for k, v in
                                                  vf.by_desc.items()}}}
        save_regions_benchmark(store, bench_prefix + ".reproj_kp",
                               bench_prefix + ".det_kp")
        save_descriptors_benchmark(store, bench_prefix + ".desc")
        print(f"benchmark splits -> {bench_prefix}.{{reproj_kp,det_kp,desc}}")
    print(f"{int(f.count())} descriptors -> {out_p}")
    return 0


def cmd_extract_batch(argv):
    """Batch extraction with skip-if-exists resume
    (reference extract_features_batch.cpp:104-116).

    `--shard I/N` restricts this process to a strided partition of the
    list — the multi-host data-parallel mode (the resume mechanism makes
    re-running failed shards idempotent)."""
    from .config import load_config
    from .io.keys import save_npz, save_oxaff
    from .parallel.distributed import shard_list
    shard = (0, 1)
    for a in list(argv):
        if a.startswith("--shard"):
            argv.remove(a)
            i, n = a.split("=")[-1].split("/") if "=" in a else \
                a[len("--shard"):].lstrip(":").split("/")
            shard = (int(i), int(n))
    list_in, list_out = argv[0], argv[1]
    cfg = load_config(argv[2] if len(argv) > 2 else _DEF_CFG,
                      argv[3] if len(argv) > 3 else _DEF_ITERS)
    with open(list_in) as fh:
        imgs = [l.strip() for l in fh if l.strip()]
    with open(list_out) as fh:
        outs = [l.strip() for l in fh if l.strip()]
    pairs = shard_list(list(zip(imgs, outs)), shard[0], shard[1])
    n_done = 0
    for img_p, out_p in pairs:
        if os.path.exists(out_p) and os.path.getsize(out_p) > 0:
            print(f"skip {out_p} (exists)")
            continue
        img = _load_gray(img_p)
        vf = _extract_one(img, cfg)
        f = next(iter(vf.by_desc.values()))
        if out_p.endswith(".npz"):
            save_npz(out_p, f)
        else:
            save_oxaff(out_p, f)
        n_done += 1
        print(f"{img_p}: {int(f.count())} descriptors -> {out_p}")
    print(f"done: {n_done} images")
    return 0


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    cmd = sys.argv[1]
    argv = sys.argv[2:]
    if cmd == "mods":
        return cmd_mods(argv)
    if cmd == "extract":
        return cmd_extract(argv)
    if cmd == "extract_batch":
        return cmd_extract_batch(argv)
    print(__doc__)
    return 1


if __name__ == "__main__":
    sys.exit(main())
