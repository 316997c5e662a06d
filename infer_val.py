#!/usr/bin/env python
"""Multi-scale mask inference (CLI-compatible with reference infer_val.py).

Loads a snapshot, runs multi-scale/flip (or multi-crop) inference over a
filelist, and writes masks at several foreground thresholds with and
without CRF.
"""

import os
import sys

import numpy as np
from PIL import Image

from wseg_tpu.config import cfg, cfg_from_file, cfg_from_list
from wseg_tpu.opts import get_arguments
from wseg_tpu.utils.timer import Timer

# (prospect_thresh, heatmap, scoremap, crf) per writer; first `test_id`
# entries are active (reference infer_val.py:52-57)
TEST_ID = [0, 1]
PROSPECT_THRESHS = [0.0, 0.1, 0.3, 0.5, 0.7]
HEATMAPS = [False] * 5
SCOREMAPS = [False] * 5
CRFS = [True, True, False, False, False]


def main(argv):
    args = get_arguments(argv)
    cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    import jax

    from wseg_tpu.data.pascal_voc import labels_from_mask, read_filelist
    from wseg_tpu.engine.infer import InferenceEngine
    from wseg_tpu.engine.writers import ResultWriter
    from wseg_tpu.models import get_model
    from wseg_tpu.utils.checkpoints import Checkpoint

    model = get_model(cfg.NET, num_classes=int(cfg.TEST.NUM_CLASSES))

    # init then load snapshot
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    ph, pw = (int(p) for p in cfg.TEST.PAD_SIZE)
    sample = jnp.zeros((1, min(ph, 256), min(pw, 256), 3), jnp.float32)
    from wseg_tpu.engine.train_loop import init_test_variables
    variables = init_test_variables(model, rng, sample.shape)

    resume = args.resume or ""
    if resume.endswith(".pth"):
        # released reference checkpoint: convert torch -> flax in place
        from wseg_tpu.utils.torch_convert import load_reference_checkpoint
        variables = load_reference_checkpoint(
            dict(variables), resume, str(cfg.NET.MODEL),
            str(cfg.NET.BACKBONE))
        print("Converted torch snapshot", resume)
    else:
        from wseg_tpu.utils.checkpoints import load_model_variables
        checkpoint = Checkpoint(args.snapshot_dir, max_n=5)
        found, variables = load_model_variables(checkpoint, args.resume,
                                                dict(variables))
        if found:
            print("Loaded snapshot", args.resume)
        else:
            print("WARNING: snapshot not found, using random init")

    if (str(cfg.NET.DTYPE) == "int8"
            and str(getattr(cfg.NET, "QUANT_ACT", "dynamic")) == "static"):
        # calibrated per-channel activation scales
        # (tools/quant_calibrate.py); serving with the zero-init stats
        # would saturate every conv input, so missing stats are an error
        stats_path = str(getattr(cfg.NET, "QUANT_STATS", ""))
        if not stats_path or not os.path.isfile(stats_path):
            raise FileNotFoundError(
                "NET.QUANT_ACT=static needs NET.QUANT_STATS pointing at "
                "a calibration msgpack (tools/quant_calibrate.py); got "
                f"{stats_path!r}")
        import flax.serialization
        with open(stats_path, "rb") as f:
            qs = flax.serialization.from_bytes(
                variables["quant_stats"], f.read())
        variables = dict(variables, quant_stats=qs)
        print("Loaded int8 activation calibration", stats_path)

    crf_fn = None
    if any(CRFS[i] for i in TEST_ID):
        # exact permutohedral CRF (native/densecrf); falls back to the
        # sparse-tap numpy approximation if the .so cannot be built
        from wseg_tpu.ops.crf_native import crf_inference_native
        crf_fn = crf_inference_native

    writers = []
    for idx in TEST_ID:
        thresh = PROSPECT_THRESHS[idx]
        out_dir = args.mask_output_dir + "_" + str(thresh).split(".")[-1]
        writers.append(ResultWriter(
            cfg.TEST, out_dir, prospect_thresh=thresh,
            heatmap=HEATMAPS[idx], scoremap=SCOREMAPS[idx],
            use_crf=CRFS[idx], crf_fn=crf_fn))

    entries = read_filelist(args.infer_list, cfg.TEST.DATA_ROOT)
    from wseg_tpu.data.pascal_voc import check_split_integrity
    check_split_integrity(
        os.path.splitext(os.path.basename(args.infer_list))[0],
        len(entries))
    timer = Timer()
    N = len(entries)

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    n_workers = max(1, int(getattr(args, "workers", 4) or 4))
    pool = ThreadPoolExecutor(n_workers)
    futures = deque()

    def read_entry(img_path, mask_path):
        image = Image.open(img_path).convert("RGB")
        gt_mask = np.asarray(Image.open(mask_path), np.int32) \
            if mask_path and os.path.isfile(mask_path) else None
        gt_labels = (labels_from_mask(
            gt_mask, num_class=int(cfg.TEST.NUM_CLASSES))
            if gt_mask is not None
            else np.zeros(int(cfg.TEST.NUM_CLASSES) - 1, np.float32))
        return image, gt_mask, gt_labels

    def progress(i):
        timer.update_progress(float(i + 1) / N)
        if i % 100 == 0:
            print("[{}/{}] finish time: {}".format(
                i, N, timer.str_est_finish()), flush=True)

    # Fast path: cross-image batched forward, on-device merge and writer
    # math (threshold/argmax/CRF); only uint8 label maps leave the
    # device.  Everything the writers need besides PNG encoding runs on
    # the TPU.  Falls back to the per-image host pipeline for
    # heatmap/scoremap writers or when the device extensions are off.
    method = str(cfg.TEST.METHOD)
    use_fast = (method in ("multiscale", "multicrop")
                and bool(cfg.TEST.DEVICE_MERGE)
                and bool(getattr(cfg.TEST, "UINT8_TRANSFER", False))
                and not any(HEATMAPS[i] or SCOREMAPS[i] for i in TEST_ID))
    if use_fast:
        from wseg_tpu.engine.infer import make_device_postprocess
        from wseg_tpu.engine.serving import MultiScaleServer
        from wseg_tpu.engine.serving_crop import MultiCropServer

        threshs = [PROSPECT_THRESHS[i] for i in TEST_ID]
        crf_threshs = [PROSPECT_THRESHS[i] for i in TEST_ID if CRFS[i]]
        # the reference's multicrop merge applies NO BG_POW discount
        # (MergeCrops, utils/inference_tools.py:257-301) — only the
        # multiscale merge does (inference_tools.py:159)
        pp = make_device_postprocess(
            threshs, crf_threshs, crf_iters=10,
            bg_pow=(float(cfg.TEST.BG_POW)
                    if method == "multiscale" else 1.0),
            crf_dtype=str(getattr(cfg.TEST, "CRF_DTYPE", "bfloat16")),
            crf_stride=int(getattr(cfg.TEST, "CRF_STRIDE", 1)),
            crf_tap_div=float(getattr(cfg.TEST, "CRF_TAP_DIV", 2.0)),
            crf_full_stride=int(getattr(cfg.TEST, "CRF_FULL_STRIDE", 1)),
            crf_refine_iters=int(getattr(cfg.TEST, "CRF_REFINE_ITERS",
                                         0)),
            crf_mode=str(getattr(cfg.TEST, "CRF_MODE", "fast")))
        # data-parallel inference over every available device (the
        # reference wraps the infer model in nn.DataParallel,
        # infer_val.py:99): slot batches shard over the mesh data axis
        mesh = None
        n_dev = len(jax.devices())
        mb = int(cfg.TEST.BATCH_SIZE)
        if n_dev > 1:
            from wseg_tpu.parallel import make_mesh
            n_data = max(d for d in range(1, n_dev + 1) if mb % d == 0)
            if n_data > 1:
                mesh = make_mesh(n_data=n_data,
                                 devices=jax.devices()[:n_data])
                print(f"Data-parallel inference over {n_data} devices")
        server_cls = (MultiScaleServer if method == "multiscale"
                      else MultiCropServer)
        server = server_cls(model, variables, cfg.TEST,
                            max_batch=mb, postprocess=pp,
                            mesh=mesh)
        # compile the bucket programs on THIS thread before the worker
        # touches them (XLA compiles inside the worker thread have been
        # observed to abort on some backends), sized from the first image
        if entries:
            with Image.open(entries[0][0]) as im0:
                server.warmup([im0.size])

        def write_result(res, img_path, image01, gt_mask):
            for k, idx in enumerate(TEST_ID):
                t = PROSPECT_THRESHS[idx]
                writers[k].save_pred(img_path, image01, res[t]["pred"],
                                     res[t].get("pred_crf"), gt_mask)

        inflight = deque()
        for i, (img_path, mask_path) in enumerate(entries):
            # bound the writer-future queue like the slow path: a slow
            # PNG/vis pool must apply backpressure, not buffer every
            # pending image in host memory
            while len(futures) > 4 * n_workers:
                futures.popleft().result()
            image, gt_mask, gt_labels = read_entry(img_path, mask_path)
            # the float image is only touched by the vis-overlay branch
            # (needs a gt_mask); skip the (H,W,3) f32 conversion otherwise
            image01 = (np.asarray(image, np.float32) / 255.0
                       if gt_mask is not None else None)
            fut = server.submit(image, gt_labels)
            inflight.append((i, fut, img_path, image01, gt_mask))
            while len(inflight) > 2 * int(cfg.TEST.BATCH_SIZE):
                j, f, p, im01, gm = inflight.popleft()
                res, _ = f.result()
                futures.append(pool.submit(write_result, res, p, im01, gm))
                progress(j)
        while inflight:
            j, f, p, im01, gm = inflight.popleft()
            res, _ = f.result()
            futures.append(pool.submit(write_result, res, p, im01, gm))
            progress(j)
        server.close()
    else:
        # Per-image host pipeline (reference semantics).  CRF + PNG
        # writes run in the thread pool so the CPU permutohedral CRF
        # overlaps the device forward (the reference left this serial,
        # its mp.Pool is commented out, reference infer_val.py:134-146).
        engine = InferenceEngine(model, variables, cfg.TEST)
        for i, (img_path, mask_path) in enumerate(entries):
            image, gt_mask, gt_labels = read_entry(img_path, mask_path)
            merged, labels = engine.run_image(image, gt_labels)
            image01 = np.asarray(image, np.float32) / 255.0
            for w in writers:
                futures.append(pool.submit(w.save, img_path, image01,
                                           merged, gt_mask))
            while len(futures) > 4 * n_workers:  # bound the queue
                futures.popleft().result()
            progress(i)

    while futures:
        futures.popleft().result()
    pool.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
