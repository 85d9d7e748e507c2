"""`maskrcnn_tpu` command-line interface.

Mirrors the reference CLI surface (`Sources/maskrcnn/main.swift:4`:
`maskrcnn {convert|evaluate|train|download}`) with the same subcommands plus
`demo` and `stream`, minus all the Docker machinery (benchmarks live in
repo-root `bench.py`) — conversion and COCO
scoring run in-process (SURVEY.md §7 step 7).

    python -m maskrcnn_tpu.cli convert  <name> [--config ... --weights ...]
    python -m maskrcnn_tpu.cli evaluate <model> <dataset> [--limit 5 ...]
    python -m maskrcnn_tpu.cli train    <model> [--steps ...]
    python -m maskrcnn_tpu.cli download <name>
    python -m maskrcnn_tpu.cli demo     <model> <image> [-o out.png]
    python -m maskrcnn_tpu.cli serve    <model> [--port 8389 --max-batch 8]

Artifacts live under `.maskrcnn/models/<name>/` like the reference's
workspace layout (`README.md:105-116`): inputs `config.json` + `weights.h5`,
outputs in `products/` (checkpoint.npz + anchors.bin + config.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _workspace(name: str) -> str:
    return os.path.join(os.environ.get("MASKRCNN_HOME", ".maskrcnn"),
                        "models", name)


def _load_config(path: str | None, name: str):
    from maskrcnn_tpu.core.config import MaskRCNNConfig

    if path is None:
        path = os.path.join(_workspace(name), "config.json")
    if os.path.exists(path):
        return MaskRCNNConfig.from_json(path)
    print(f"# no config at {path}; using defaults (resnet101, 1024², 81 "
          "classes)", file=sys.stderr)
    return MaskRCNNConfig()


def _build_detector(name: str, config_path, weights_path, products_dir=None,
                    data_parallel: int = 0, exact: bool = False):
    import jax

    from maskrcnn_tpu.pipeline.detector import MaskRCNNDetector

    config = _load_config(config_path, name)
    if exact:
        # one-switch reference-exact numerics (f32 + exact top-k + table
        # anchors) — see MaskRCNNConfig.exact_numerics
        config = config.exact_numerics()
        print("# --exact: float32 compute, exact top-k, table anchors",
              file=sys.stderr)
    products = products_dir or os.path.join(_workspace(name), "products")
    ckpt = os.path.join(products, "checkpoint.npz")
    if weights_path is None:
        if os.path.exists(ckpt):
            weights_path = ckpt
        else:
            h5 = os.path.join(_workspace(name), "weights.h5")
            weights_path = h5 if os.path.exists(h5) else None
    if weights_path is None:
        print("# WARNING: no weights found — using random init",
              file=sys.stderr)
        det = MaskRCNNDetector.from_random(config)
    else:
        print(f"# loading weights: {weights_path}", file=sys.stderr)
        det = MaskRCNNDetector.from_checkpoint(config, weights_path)
    if data_parallel:
        det = MaskRCNNDetector(config, det.params,
                               data_parallel=data_parallel)
    return det, config


# ---------------------------------------------------------------------------
# convert
# ---------------------------------------------------------------------------

def cmd_convert(args) -> int:
    import jax

    if getattr(args, "export_savedmodel", None):
        # The exported graph must take the pure-XLA (Pallas-free) path:
        # force the CPU backend before the first device op. Conversion
        # itself needs no accelerator.
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from maskrcnn_tpu.core.anchors import generate_anchors, save_anchors_bin
    from maskrcnn_tpu.io.weights import (
        load_h5_weights, merge_pretrained, save_npz_checkpoint)
    from maskrcnn_tpu.models.mask_rcnn import init_mask_rcnn

    config = _load_config(args.config, args.name)
    weights = args.weights or os.path.join(_workspace(args.name),
                                           "weights.h5")
    out_dir = args.output_dir or os.path.join(_workspace(args.name),
                                              "products")
    os.makedirs(out_dir, exist_ok=True)

    init = init_mask_rcnn(jax.random.PRNGKey(0), config)
    t0 = time.time()
    loaded = load_h5_weights(weights)
    params, missing, unused = merge_pretrained(
        init, loaded, strict=not args.allow_missing)
    print(f"# loaded {len(loaded)} layers in {time.time()-t0:.1f}s "
          f"({len(unused)} unused, {len(missing)} missing)", file=sys.stderr)

    ckpt_dtype = np.float16 if getattr(args, "fp16", False) else np.float32
    save_npz_checkpoint(params, os.path.join(out_dir, "checkpoint.npz"),
                        dtype=ckpt_dtype)
    anchors = generate_anchors(config)
    save_anchors_bin(anchors, os.path.join(out_dir, "anchors.bin"))
    config.to_json(os.path.join(out_dir, "config.json"))
    print(f"products written to {out_dir}: checkpoint.npz"
          f"{' (fp16)' if ckpt_dtype is np.float16 else ''}, anchors.bin "
          f"({anchors.shape[0]} anchors), config.json")

    if getattr(args, "export_savedmodel", None):
        from maskrcnn_tpu.io.export import (export_savedmodel,
                                            verify_savedmodel)

        sm_dir = args.export_savedmodel
        t0 = time.time()
        export_savedmodel(params, config, sm_dir,
                          batch=args.export_batch)
        diff = verify_savedmodel(sm_dir, params, config,
                                 batch=args.export_batch)
        print(f"SavedModel exported to {sm_dir} in {time.time()-t0:.1f}s "
              f"(batch {args.export_batch}; reload-vs-JAX max |diff| "
              f"{diff:.2e})")
        if diff > 1e-4:
            # Large diffs at RANDOM weights are usually a near-tie NMS
            # flip under a different kernel library (e.g. a TF process
            # that already imported with oneDNN on); trained weights have
            # wide margins. Warn by default; --strict-export makes a
            # broken export a hard failure for CI/automation (ADVICE r04).
            print("# WARNING: SavedModel reload differs from the JAX "
                  "forward beyond 1e-4 — likely a near-tie detection "
                  "flip from a different conv kernel library; verify "
                  "with trained weights (and TF_ENABLE_ONEDNN_OPTS=0)",
                  file=sys.stderr)
            if getattr(args, "strict_export", False):
                print("# --strict-export: failing on reload mismatch",
                      file=sys.stderr)
                return 1
    return 0


# ---------------------------------------------------------------------------
# evaluate
# ---------------------------------------------------------------------------

def cmd_evaluate(args) -> int:
    import numpy as np

    from maskrcnn_tpu.evalkit.coco import COCODataset
    from maskrcnn_tpu.evalkit.cocoeval import COCOEvaluator
    from maskrcnn_tpu.evalkit.results import (
        build_results_proto, detections_to_coco_results, load_coco_results,
        save_coco_results, save_results_proto)
    from maskrcnn_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    detector, config = _build_detector(args.model, args.config, args.weights,
                                       args.products_dir,
                                       data_parallel=args.dp,
                                       exact=args.exact)
    ann_dir = args.annotations_dir or os.path.join("data", args.dataset)
    dataset = COCODataset.from_dir(ann_dir, args.type, args.year)
    images_dir = args.images_dir or os.path.join(
        "data", args.dataset, f"{args.type}{args.year}")

    rows = []
    per_image = {}
    times = []
    n = 0
    eval_ids = []
    # The reference hardcodes the first 5 images sorted by id
    # (EvaluateCommand.swift:165); --limit makes that configurable, and
    # --batch amortizes the compiled pipeline over image chunks (the
    # reference decodes and infers strictly serially at batch=1 —
    # EvaluateCommand.swift:165-194). Decode+letterbox run in native code
    # on a prefetch thread pool (pipeline/loader.py), so host decoding of
    # the next batch overlaps device compute of the current one.
    from maskrcnn_tpu.pipeline.loader import PrefetchLoader

    pending, pending_ids = [], []

    def flush():
        nonlocal n
        if not pending:
            return
        t0 = time.time()
        # --uint8 quantizes the resampled canvases for the wire: 4x fewer
        # host->device bytes — and the axon-tunnel host-RAM-leak
        # mitigation for val2017-scale runs (~16 GB retained instead of
        # ~63 GB at 5k images; PERF.md r04 leak note). Quantization is
        # host-side work, charged OUTSIDE the inference phase.
        canvases = [c for c, _ in pending]
        if args.uint8:
            from maskrcnn_tpu.pipeline.preprocess import quantize_canvas_u8
            canvases = [quantize_canvas_u8(c) for c in canvases]
        with timer.phase("inference"):
            # "rle": per-detection region paste + O(box area) RLE encode —
            # full-canvas masks at val2017 scale are ~30 GB live and were
            # the results-leg bottleneck (docs/bench_results_leg_r03.json)
            all_dets = detector.detect_canvases(
                canvases, [w for _, w in pending],
                batch_size=args.batch, paste_masks="rle")
        dt = (time.time() - t0) / len(pending)
        for img_id, dets in zip(pending_ids, all_dets):
            times.append(dt)
            # per-image wall time, like EvaluateCommand.swift:167,179,193
            print(f"image {img_id}: {len(dets)} detections in "
                  f"{dt*1000:.1f} ms", file=sys.stderr)
            with timer.phase("results"):
                rows.extend(
                    detections_to_coco_results(img_id, dets, dataset))
            per_image[img_id] = dets
            eval_ids.append(img_id)
            n += 1
        pending.clear()
        pending_ids.clear()

    def iter_paths():
        for im in dataset.iter_images(limit=args.limit, sort_by_id=True):
            path = os.path.join(images_dir, im.file_name)
            if not os.path.exists(path):
                print(f"# skipping {im.id}: {path} not found",
                      file=sys.stderr)
                continue
            yield im.id, path

    eval_paths: dict[int, str] = {}

    def iter_paths_remembering():
        for img_id, path in iter_paths():
            eval_paths[img_id] = path
            yield img_id, path

    loader = iter(PrefetchLoader(iter_paths_remembering(),
                                 detector.config.image_height,
                                 depth=max(2 * args.batch, 4)))
    while True:
        # The phase measures time BLOCKED on decode (the prefetch pool works
        # ahead, so this is ~0 when the device is the bottleneck and the
        # true decode cost when the host is).
        with timer.phase("load+decode"):
            item = next(loader, None)
        if item is None:
            break
        img_id, canvas, win = item
        pending.append((canvas, win))
        pending_ids.append(img_id)
        if len(pending) >= args.batch:
            flush()
    flush()
    if n == 0:
        print("no images evaluated (missing files?)", file=sys.stderr)
        return 1

    os.makedirs(args.results_dir, exist_ok=True)
    save_coco_results(rows, os.path.join(args.results_dir, "results.json"))
    save_results_proto(build_results_proto(per_image, dataset),
                       os.path.join(args.results_dir, "results.pb"))
    print(f"# {n} images, median {np.median(times)*1000:.1f} ms/img",
          file=sys.stderr)
    print("# phase breakdown:\n" + timer.report(), file=sys.stderr)

    for iou_type in ("bbox", "segm"):
        print(f"== {iou_type} ==")
        COCOEvaluator(dataset, rows, iou_type,
                      img_ids=eval_ids).summarize()

    if args.compare:
        print(f"== comparison results: {args.compare} ==")
        other = load_coco_results(args.compare)
        for iou_type in ("bbox", "segm"):
            has_segm = any("segmentation" in r for r in other)
            if iou_type == "segm" and not has_segm:
                continue
            print(f"== {iou_type} (compare) ==")
            COCOEvaluator(dataset, other, iou_type,
                          img_ids=eval_ids).summarize()

    if args.compare_tf:
        # The reference's `-c` mode: run the SAME weights through an
        # independent TF implementation and print both AP tables
        # (EvaluateCommand.swift:124-127, COCOEval/task.py:99-105) — here
        # in-process via evalkit/tf_forward.py, no Docker.
        import jax

        from maskrcnn_tpu.core.anchors import generate_anchors
        from maskrcnn_tpu.evalkit.tf_forward import tf_forward
        from maskrcnn_tpu.pipeline.detector import Detection
        from maskrcnn_tpu.pipeline.loader import load_letterboxed

        print("== TensorFlow oracle (same weights, independent "
              "implementation) ==", file=sys.stderr)
        params_np = jax.device_get(detector.params)
        anchors_np = np.asarray(generate_anchors(config))
        tf_rows = []
        for img_id in eval_ids:
            canvas, win = load_letterboxed(eval_paths[img_id],
                                           config.image_height)
            res = tf_forward(params_np, canvas[None], anchors_np, config)[0]
            d = len(res["scores"])
            det_rows = np.concatenate(
                [res["boxes"],
                 res["class_ids"][:, None].astype(np.float32),
                 res["scores"][:, None]], axis=1) if d else np.zeros((0, 6))
            dets = detector.unmold(det_rows, res["masks"],
                                   np.ones((d,), bool), win,
                                   paste_masks="rle")
            tf_rows.extend(detections_to_coco_results(img_id, dets, dataset))
        # persisted so callers (e.g. tools/flagship_proof.py) can score the
        # oracle results alongside the device results
        save_coco_results(tf_rows,
                          os.path.join(args.results_dir, "results_tf.json"))
        for iou_type in ("bbox", "segm"):
            print(f"== {iou_type} (TF oracle) ==")
            COCOEvaluator(dataset, tf_rows, iou_type,
                          img_ids=eval_ids).summarize()
    return 0


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------

def cmd_train(args) -> int:
    """Real training loop (the reference's TrainCommand is a 'Coming soon'
    stub — TrainCommand.swift:10-14). Trains on a COCO-format dataset dir,
    or --synthetic for a self-contained overfit demo."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskrcnn_tpu.core.anchors import generate_anchors
    from maskrcnn_tpu.io.weights import save_npz_checkpoint
    from maskrcnn_tpu.models.mask_rcnn import init_mask_rcnn
    from maskrcnn_tpu.train.step import make_train_state, train_step

    config = _load_config(args.config, args.model)
    if args.exact:
        config = config.exact_numerics()
        print("# --exact: float32 compute, exact top-k, table anchors",
              flush=True)
    if args.train_bn:
        config = config.replace(train_bn=args.train_bn)
    if args.remat:
        config = config.replace(train_remat_backbone=True)
    if args.bf16_momentum:
        config = config.replace(train_momentum_dtype="bfloat16")
    if args.synthetic:
        config = config.replace(
            architecture="resnet50",
            input_image_shape=(args.image_size, args.image_size, 3),
            num_classes=5,
            anchor_scales=tuple(args.image_size / 16 * s
                                for s in (1, 2, 4, 8, 16)),
            pre_nms_max_proposals=256, max_proposals=64, max_detections=16,
            train_rois_per_image=32, rpn_train_anchors_per_image=64)

    params = init_mask_rcnn(jax.random.PRNGKey(args.seed), config)
    anchors = jnp.asarray(generate_anchors(config))
    state, tx_and_mask = make_train_state(params, config,
                                          trainable=args.trainable)

    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        g, m = 4, config.mask_size
        yx1 = rng.uniform(0, 0.6, (args.batch, g, 2))
        wh = rng.uniform(0.1, 0.3, (args.batch, g, 2))
        batch = {
            "images": jnp.asarray(rng.uniform(
                0, 255, (args.batch, config.image_height,
                         config.image_width, 3)), jnp.float32),
            "gt_boxes": jnp.asarray(
                np.concatenate([yx1, yx1 + wh], -1), jnp.float32),
            "gt_class_ids": jnp.asarray(rng.integers(
                1, config.num_classes, (args.batch, g)), jnp.int32),
            "gt_masks": jnp.asarray(
                (rng.random((args.batch, g, m, m)) > 0.5), jnp.float32),
        }
        loader = lambda step: batch  # noqa: E731 — fixed-batch overfit demo
    else:
        from maskrcnn_tpu.train.data import COCOTrainLoader, PrefetchBatcher
        loader_obj = COCOTrainLoader(
            args.annotations, args.images_dir, config,
            batch_size=args.batch, seed=args.seed,
            flip_prob=args.flip_prob, cache_images=args.cache_images,
            # --exact keeps the exact f32 resample values; production
            # training ships uint8 canvases (4x less transfer, and the
            # axon-leak mitigation documented in train/data.py)
            image_dtype=np.float32 if args.exact else np.uint8)
        # one-ahead prefetch: batch t+1 decodes while the device runs step t
        batcher = PrefetchBatcher(loader_obj)
        loader = batcher.get_batch

    from maskrcnn_tpu.train.checkpoint import (CheckpointManager,
                                               MetricsLogger,
                                               restore_train_state)

    manager = (CheckpointManager(args.checkpoint_dir, keep=args.keep)
               if args.checkpoint_dir else None)
    if args.resume:
        restored = (manager.restore_latest(state)
                    if manager is not None else None)
        if restored is not None:
            state = restored
            print(f"resumed from {args.checkpoint_dir} at step "
                  f"{int(state.step)}")
        elif args.state and os.path.exists(args.state):
            # empty --checkpoint-dir falls back to --state, not step 0
            state = restore_train_state(state, args.state)
            print(f"resumed from {args.state} at step {int(state.step)}")
        else:
            print("# --resume: no checkpoint found, starting fresh",
                  file=sys.stderr)

    mlog = MetricsLogger(args.metrics_log)
    # Per-step key = fold_in(base, step): resume-stable — a resumed run's
    # sampling/augmentation randomness continues exactly where an
    # uninterrupted run would be, instead of replaying from the seed
    # (ADVICE r03; the loader's per-step rng is derived the same way).
    base_key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    start_step = int(state.step)
    end_step = start_step + args.steps
    if args.resume and start_step > 0:
        # crash-recovery semantics: --steps is the TOTAL budget, so an
        # interrupted run picks up where it left off and finishes the plan
        # instead of training N more steps on top
        end_step = max(args.steps, start_step)
        print(f"# --resume: continuing to total step {end_step}")
        if start_step >= end_step:
            print(f"# WARNING: checkpoint is already at step {start_step} "
                  f">= --steps {args.steps}; ZERO steps will run. "
                  f"--steps is the TOTAL budget under --resume — raise it "
                  f"to train further.", file=sys.stderr)
    for step in range(start_step, end_step):
        sub = jax.random.fold_in(base_key, step)
        state, metrics = train_step(
            state, loader(step), anchors, sub, config, tx_and_mask)
        if (step % args.log_every == 0
                or step == end_step - 1):
            m_ = {k: round(float(v), 4) for k, v in metrics.items()}
            print(f"step {step:5d}  {m_}  ({time.time()-t0:.1f}s)")
            mlog.log(step, metrics, time.time() - t0)
        if (manager is not None and args.checkpoint_every
                and (step + 1) % args.checkpoint_every == 0):
            manager.save(state)
    if manager is not None:
        path = manager.save(state)
        manager.wait()
        print(f"train state saved: {path} (step {int(state.step)})")
    if args.state:
        from maskrcnn_tpu.train.checkpoint import save_train_state
        save_train_state(state, args.state)
        print(f"train state saved: {args.state} (step {int(state.step)})")
    params_out = state.params
    if config.train_bn == "batch" and not args.no_calibrate:
        # moving stats were never updated during batch-stat training;
        # re-estimate them so the frozen-stat inference path works.
        from maskrcnn_tpu.train.calibrate import calibrate_bn_stats
        cal_batches = [loader(i)["images"] for i in range(args.calibrate_batches)]
        params_out = calibrate_bn_stats(params_out, cal_batches, anchors,
                                        config)
        print(f"BN statistics calibrated over {len(cal_batches)} batches")
    if args.output:
        save_npz_checkpoint(params_out, args.output)
        print(f"checkpoint saved: {args.output}")
    if not args.synthetic:
        batcher.close()  # cancel the dangling one-ahead prefetch
    return 0


# ---------------------------------------------------------------------------
# download
# ---------------------------------------------------------------------------

def cmd_download(args) -> int:
    """Fetch pretrained artifacts, like DownloadCommand.swift:5-51 (which
    pulls from the project's GitHub release tag). Zero-egress environments
    get a clear failure instead of a hang."""
    import urllib.error
    import urllib.request

    dest = os.path.join(_workspace(args.name))
    os.makedirs(dest, exist_ok=True)
    url = args.url or ("https://github.com/matterport/Mask_RCNN/releases/"
                       "download/v2.0/mask_rcnn_coco.h5")
    out = os.path.join(dest, "weights.h5")
    if args.url and os.path.exists(args.url):
        # local artifact mirror (the offline story: zero-egress hosts
        # stage release files on disk) — copy instead of fetching
        import shutil

        shutil.copyfile(args.url, out)
        print(f"copied local artifact {args.url} -> {out}")
        return 0
    print(f"downloading {url} -> {out}")
    try:
        with urllib.request.urlopen(url, timeout=args.timeout) as r, \
                open(out + ".part", "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(out + ".part", out)
        print("done")
        return 0
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        print(f"download failed ({e}); this environment may have no network "
              f"egress. Place weights.h5 under {dest}/ manually.",
              file=sys.stderr)
        return 1


# ---------------------------------------------------------------------------
# stream
# ---------------------------------------------------------------------------

def cmd_stream(args) -> int:
    """Streaming video inference with the persistent compiled pipeline."""
    from maskrcnn_tpu.pipeline.stream import (
        frames_from_dir, run_stream, synthetic_frames)

    detector, config = _build_detector(args.model, args.config, args.weights,
                                       None, exact=args.exact)
    size = config.image_height
    if args.frames_dir:
        frames = frames_from_dir(args.frames_dir, size)
    else:
        frames = synthetic_frames(args.num_frames, size)

    # warm up the compile off the clock — uint8, matching the wire format
    # run_stream ships (a float warmup would compile a second, unused trace).
    # With --device-paste the full-res paste is FUSED INTO the jitted forward
    # (models/mask_rcnn.py paste_size): zero extra dispatches per frame —
    # a separate per-frame paste dispatch costs an RPC round-trip and
    # serializes with the next frame's forward (the round-2 9.6 fps cause).
    import numpy as np
    paste_size = size if args.device_paste else None
    detector.run_batch(np.zeros((args.micro_batch, size, size, 3),
                                np.uint8), paste_size=paste_size)

    valid_refs = []  # device references only — NO syncs on the hot path

    def on_result(i, out):
        # out["pasted"] (full-res on-device masks) is already materialized
        # in HBM by the same program; consumers would device-get or render.
        valid_refs.append(out["valid"])

    if args.device_frames:
        # Pre-stage micro-batches on device: measures the persistent
        # pipeline's steady-state compute throughput with the host->device
        # wire out of the loop (over a remote tunnel the wire dominates;
        # a locally-attached deployment sees this number).
        import jax

        from maskrcnn_tpu.pipeline.preprocess import quantize_canvas_u8

        # Quantize BEFORE staging: the non-prebatched path always ships
        # uint8 (run_stream's wire convention), so staged batches must
        # match — a float32 staged batch would silently compile and run a
        # second program the uint8 warm-up above never touched (ADVICE r04).
        staged, buf = [], []
        for f in frames:
            buf.append(quantize_canvas_u8(f))
            if len(buf) == args.micro_batch:
                staged.append(jax.device_put(np.stack(buf)))
                buf = []
        if buf:
            staged.append(jax.device_put(np.stack(buf)))
        jax.block_until_ready(staged)
        stats = run_stream(detector, staged, on_result=on_result,
                           micro_batch=args.micro_batch, prebatched=True,
                           paste_size=paste_size)
    else:
        stats = run_stream(
            detector, frames, on_result=on_result,
            micro_batch=args.micro_batch, paste_size=paste_size)
    counts = [int(v.sum()) for v in valid_refs]  # off the clock
    print(f"{stats.frames} frames in {stats.wall_s:.2f}s -> "
          f"{stats.fps:.1f} fps, latency p50 {stats.p50_latency_ms:.1f} / "
          f"p95 {stats.p95_latency_ms:.1f} / p99 {stats.p99_latency_ms:.1f} "
          f"ms ({stats.latency_probes} probes), "
          f"detections per microbatch: {counts[:8]}{'...' if len(counts) > 8 else ''}")
    if args.json:
        import jax
        with open(args.json, "w") as f:
            json.dump({
                "metric": f"stream_fps_{config.architecture}_"
                          f"{config.image_height}",
                "frames": stats.frames,
                "micro_batch": args.micro_batch,
                "device_paste": bool(args.device_paste),
                "device_frames": bool(args.device_frames),
                "wall_s": round(stats.wall_s, 3),
                "fps": round(stats.fps, 2),
                "p50_latency_ms": round(stats.p50_latency_ms, 2),
                "p95_latency_ms": round(stats.p95_latency_ms, 2),
                "p99_latency_ms": round(stats.p99_latency_ms, 2),
                "latency_probes": stats.latency_probes,
                # r05 methodology: fps from amortized in-order sync
                # (sync_every batches; r03's per-batch block_until_ready
                # was unsound over the tunnel); p50/p95/p99 from separate
                # blocking probes that RE-RUN the stream's own last full
                # input batch (real content — the NMS fixpoint is
                # data-dependent, so a zeros probe understates latency;
                # ADVICE r04), device-staged so the host->device wire is
                # excluded (measured separately:
                # docs/stream_latency_decomp_r04.json).
                "latency_methodology":
                    "r05_blocking_probes_device_staged_real_frame",
                "device": jax.devices()[0].device_kind,
            }, f, indent=1)
        print(f"# wrote {args.json}", file=sys.stderr)
    return 0


# ---------------------------------------------------------------------------
# serve
# ---------------------------------------------------------------------------

def cmd_serve(args) -> int:
    """HTTP model server with dynamic micro-batching (pipeline/serve.py)."""
    import numpy as np

    from maskrcnn_tpu.pipeline.serve import make_server

    detector, config = _build_detector(args.model, args.config, args.weights,
                                       None, exact=args.exact)
    size = config.image_height
    # uint8 wire by default (request pixels are 8-bit JPEG; keeps host
    # RAM flat over the tunnel — PERF.md r04); --exact restores float32
    # canvases end-to-end per its reference-exact-numerics contract.
    uint8_wire = not args.exact
    # Warm the single compiled batch shape off the serving path — with
    # the dtype the serving path will actually send (dtype is part of
    # the jit cache key; a float32 warm-up would leave the uint8 path
    # to compile on the first real request).
    wire_dtype = np.uint8 if uint8_wire else np.float32
    detector.run_batch(np.zeros((args.max_batch, size, size, 3),
                                wire_dtype))

    server, worker = make_server(detector, host=args.host, port=args.port,
                                 max_batch=args.max_batch,
                                 window_ms=args.window_ms,
                                 uint8_wire=uint8_wire)
    host, port = server.server_address[:2]
    print(f"# serving on http://{host}:{port}  "
          f"(POST /detect, GET /healthz; batch<={args.max_batch}, "
          f"window {args.window_ms} ms)", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        worker.stop()
        server.server_close()
    return 0


# ---------------------------------------------------------------------------
# demo
# ---------------------------------------------------------------------------

def cmd_demo(args) -> int:
    from PIL import Image

    from maskrcnn_tpu.core.coco_names import class_name
    from maskrcnn_tpu.pipeline.loader import decode_rgb
    from maskrcnn_tpu.utils.render import render_detections

    detector, config = _build_detector(args.model, args.config, args.weights,
                                       None, exact=args.exact)
    img = decode_rgb(args.image)
    t0 = time.time()
    dets = detector.detect_images([img])[0]
    print(f"{len(dets)} detections in {(time.time()-t0)*1000:.0f} ms "
          "(includes compile on first call)")
    # Human-readable labels, like the reference's classLabel surface
    # (results.pb.swift:138 filled in EvaluateCommand.swift:203-248 and
    # rendered by DetectionRenderer.swift:11-88).
    names = [class_name(i, config.num_classes)
             for i in range(config.num_classes)]
    for d in dets:
        print(f"  {names[d.class_id]}  score {d.score:.3f}  box "
              f"({d.box[0]:.0f},{d.box[1]:.0f},{d.box[2]:.0f},{d.box[3]:.0f})")
    out = args.output or "detections.png"
    rendered = render_detections(img, dets, class_names=names)
    Image.fromarray(rendered).save(out)
    print(f"rendered: {out}")
    return 0


# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="maskrcnn_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("convert", help="weights.h5 -> products/ artifacts")
    c.add_argument("name")
    c.add_argument("--config")
    c.add_argument("--weights")
    c.add_argument("--output_dir")
    c.add_argument("--allow-missing", action="store_true")
    c.add_argument("--export-savedmodel", metavar="DIR",
                   help="also stage the full single-program forward out "
                        "as a TF SavedModel via jax2tf (weights + anchors"
                        " + preprocess baked in, `detect` signature) — "
                        "the cross-framework deployment leg of the "
                        "conversion pipeline; verified against the JAX "
                        "forward on export")
    c.add_argument("--export-batch", type=int, default=1,
                   help="static batch size of the exported signature")
    c.add_argument("--strict-export", action="store_true",
                   help="exit nonzero if the SavedModel reload differs "
                        "from the JAX forward beyond 1e-4 (default only "
                        "warns: random-weight near-tie NMS flips under a "
                        "different conv library are expected)")
    c.add_argument("--fp16", action="store_true",
                   help="store checkpoint weights as float16 (the "
                        "reference fp16-quantizes all three converted "
                        "models); upcast to f32 at load")
    c.set_defaults(fn=cmd_convert)

    e = sub.add_parser("evaluate", help="COCO evaluation (bbox + mask AP)")
    e.add_argument("model")
    e.add_argument("dataset")
    e.add_argument("--year", default="2017")
    e.add_argument("--type", default="val")
    e.add_argument("--limit", type=int, default=5,
                   help="images to evaluate (reference hardcodes 5)")
    e.add_argument("--batch", type=int, default=1,
                   help="inference batch size (reference is batch=1)")
    e.add_argument("--dp", type=int, default=0,
                   help="shard each batch over N local devices "
                        "(0 = single device, -1 = all)")
    e.add_argument("--config")
    e.add_argument("--weights")
    e.add_argument("--products_dir")
    e.add_argument("--annotations_dir")
    e.add_argument("--images_dir")
    e.add_argument("--results_dir", default=".maskrcnn/tmp")
    e.add_argument("-c", "--compare", metavar="RESULTS_JSON",
                   help="also score an oracle results file side-by-side")
    e.add_argument("--uint8", action="store_true",
                   help="ship uint8 canvases to the device (±0.5 LSB "
                        "resample quantization — the reference feeds "
                        "uint8 frames to CoreML anyway): 4x less "
                        "host->device transfer, and the recommended "
                        "setting for val2017-scale runs over the axon "
                        "tunnel (its client leaks ~every transferred "
                        "byte — PERF.md r04)")
    e.add_argument("--exact", action="store_true",
                   help="reference-exact numerics: float32 + exact top-k + table anchors (production defaults trade <=0.01 AP for ~2x throughput)")
    e.add_argument("--compare-tf", action="store_true",
                   help="run the same weights through the in-process "
                        "TensorFlow oracle and score both (the reference's "
                        "-c mode, without Docker)")
    e.set_defaults(fn=cmd_evaluate)

    t = sub.add_parser("train", help="train (real, not a stub)")
    t.add_argument("model")
    t.add_argument("--config")
    t.add_argument("--annotations")
    t.add_argument("--images_dir")
    t.add_argument("--synthetic", action="store_true",
                   help="self-contained overfit demo, no dataset needed")
    t.add_argument("--steps", type=int, default=20)
    t.add_argument("--batch", type=int, default=2)
    t.add_argument("--image-size", type=int, default=128)
    t.add_argument("--trainable", default="all",
                   help="all|heads|3+|4+|5+ or a layer-name regex")
    t.add_argument("--train-bn", choices=("batch", "frozen"),
                   help="override config.train_bn: 'batch' = from-scratch "
                        "recipe (live batch stats + post-training "
                        "calibration); 'frozen' = Matterport fine-tuning "
                        "recipe (stored stats, ALL BatchNorm layers "
                        "frozen — the 21.1 img/s config with --remat at "
                        "batch 16, docs/bench_train_r04.json)")
    t.add_argument("--remat", action="store_true",
                   help="rematerialize the backbone+FPN in the backward "
                        "pass (config.train_remat_backbone) — required "
                        "for batch >= 16 at 1024² on a 16 GB chip")
    t.add_argument("--bf16-momentum", action="store_true",
                   help="bfloat16 SGD momentum accumulator "
                        "(config.train_momentum_dtype): halves optimizer-"
                        "state HBM footprint/traffic; params stay float32")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log-every", type=int, default=5)
    t.add_argument("--output", help="write final checkpoint.npz here")
    t.add_argument("--state", help="train-state file for save/resume")
    t.add_argument("--no-calibrate", action="store_true",
                   help="skip post-training BN statistics calibration")
    t.add_argument("--calibrate-batches", type=int, default=8)
    t.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint-dir (latest) or --state; "
                        "--steps then counts as the TOTAL budget (finish "
                        "the plan), not N more steps")
    t.add_argument("--checkpoint-dir",
                   help="directory for periodic ckpt_<step>.msgpack saves")
    t.add_argument("--checkpoint-every", type=int, default=0,
                   help="save every N steps (0 = only at the end)")
    t.add_argument("--keep", type=int, default=3,
                   help="checkpoints to retain in --checkpoint-dir")
    t.add_argument("--metrics-log",
                   help="append JSONL training metrics to this file")
    t.add_argument("--flip-prob", type=float, default=0.5,
                   help="horizontal-flip augmentation probability "
                        "(Matterport's Fliplr(0.5); 0 disables)")
    t.add_argument("--exact", action="store_true",
                   help="reference-exact numerics in training too: float32"
                        " compute, exact top-k everywhere (incl. target"
                        " subsampling), table anchors")
    t.add_argument("--cache-images", type=int, default=0,
                   help="cache up to N decoded pre-flip examples in host "
                        "RAM (~12.6 MB each at 1024²) — on a slow-decode "
                        "host, small fine-tuning sets are loader-bound "
                        "without this; 0 disables. No eviction: the FIRST "
                        "N distinct images seen are pinned, so size it to "
                        "the whole dataset (partial caching speeds up only "
                        "an arbitrary first-seen subset)")
    t.set_defaults(fn=cmd_train)

    d = sub.add_parser("download", help="fetch pretrained weights")
    d.add_argument("name")
    d.add_argument("--url")
    d.add_argument("--timeout", type=float, default=30.0)
    d.set_defaults(fn=cmd_download)

    st = sub.add_parser("stream", help="streaming inference (video frames)")
    st.add_argument("model")
    st.add_argument("--frames-dir", help="directory of frames (else synthetic)")
    st.add_argument("--num-frames", type=int, default=64)
    st.add_argument("--micro-batch", type=int, default=1)
    st.add_argument("--device-paste", action="store_true",
                    help="paste full-resolution masks on device per frame")
    st.add_argument("--device-frames", action="store_true",
                    help="pre-stage frames on device (steady-state compute "
                         "throughput, host->device wire off the clock)")
    st.add_argument("--exact", action="store_true", help="reference-exact numerics: float32 + exact top-k + table anchors (production defaults trade <=0.01 AP for ~2x throughput)")
    st.add_argument("--json", help="write a stats JSON artifact here")
    st.add_argument("--config")
    st.add_argument("--weights")
    st.set_defaults(fn=cmd_stream)

    sv = sub.add_parser("serve", help="HTTP server w/ dynamic batching")
    sv.add_argument("model")
    sv.add_argument("--config")
    sv.add_argument("--weights")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8389)
    sv.add_argument("--max-batch", type=int, default=8)
    sv.add_argument("--window-ms", type=float, default=5.0)
    sv.add_argument("--exact", action="store_true", help="reference-exact numerics: float32 + exact top-k + table anchors (production defaults trade <=0.01 AP for ~2x throughput)")
    sv.set_defaults(fn=cmd_serve)

    m = sub.add_parser("demo", help="detect + render one image")
    m.add_argument("model")
    m.add_argument("image")
    m.add_argument("-o", "--output")
    m.add_argument("--config")
    m.add_argument("--weights")
    m.add_argument("--exact", action="store_true", help="reference-exact numerics: float32 + exact top-k + table anchors (production defaults trade <=0.01 AP for ~2x throughput)")
    m.set_defaults(fn=cmd_demo)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.fn is not cmd_download:  # the one subcommand that never jits
        from maskrcnn_tpu.utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()  # repeated invocations skip recompiles
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
