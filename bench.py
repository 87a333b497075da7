"""Benchmark: segmented frames/sec/chip at 512px (keyframe + interpolation).

The reference's headline workload (SURVEY §3.4 / BASELINE.md): flow predict —
encode two 512px key frames, warp features along block-MV grids to all
frame_delta-1 intermediate positions, fuse, decode all frames in one batched
call, upsample + argmax. The reference measures this as the
"predict_interference" profiler region (flow/base.py:269-328) and reports up
to 76.85 FPS on an RTX 5000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 76.85 (the reference's published FPS).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

FRAME_DELTA = 25
SIZE = 513           # PSPNet wants 8k+1
REFERENCE_FPS = 76.85
CLIPS_TIMED = 8
PASSES = 5           # repeat protocol: median-of-PASSES is the headline


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed clips")
    ap.add_argument("--streaming", action="store_true",
                    help="also time an end-to-end pass with the loader "
                         "(host decode + transfer) inside the timed loop")
    ap.add_argument("--multiclip", type=int, default=0, metavar="B",
                    help="also time a B-clips-per-program variant (vmapped "
                         "window program; amortizes dispatch + pads the "
                         "decoder batch). NOTE: batching CONSECUTIVE "
                         "windows of one video forfeits key-feature reuse "
                         "(measured slower); --streams composes batching "
                         "WITH reuse")
    ap.add_argument("--streams", type=int, default=0, metavar="B",
                    help="also time B concurrent video streams in one "
                         "vmapped program, each lane reusing ITS OWN "
                         "previous-window key features (the multi-camera "
                         "serving shape: reuse needs consecutive windows "
                         "of the SAME stream, so batching across streams "
                         "is the only way to batch without forfeiting it)")
    ap.add_argument("--int8", action="store_true",
                    help="force the decoder convs into int8 on the MXU "
                         "(BN folded, dynamic activation scales; pspnet "
                         "SegHead / deeplabv3 DeepLabHead). Default: AUTO "
                         "— on for those archs (the product default, "
                         "validated in tests/test_quant.py incl. against a "
                         "trained head), off for vit")
    ap.add_argument("--no-int8", action="store_true",
                    help="force the full-precision (bf16) decoder")
    ap.add_argument("--int8-enc", action="store_true",
                    help="also quantize the ResNet encoder trunk to int8 "
                         "(W8A8 PTQ, ops/quant.py::int8_resnet_trunk; "
                         "opt-in — accuracy impact under study)")
    ap.add_argument("--out-size", default=None, metavar="HxW",
                    help="predict OUTPUT size (int32 class maps), e.g. "
                         "1072x1920 — the production predict emission "
                         "(reference flow/base.py:275-277). Default: the "
                         "bench frame size")
    ap.add_argument("--epilogue-ab", action="store_true",
                    help="measure the 2x2 upsample/argmax epilogue matrix "
                         "at --out-size: {fused resize_argmax on/off} x "
                         "{pallas resize+quantize on/off} (3 extra "
                         "compiles; TPU only)")
    ap.add_argument("--no-ab", action="store_true",
                    help="skip the pallas resize-kernel on/off A-B (saves "
                         "one extra compile; the A-B only runs when the "
                         "kernel is active: int8 decode on a TPU backend)")
    ap.add_argument("--arch", default="pspnet",
                    choices=("pspnet", "deeplabv3", "vit"),
                    help="flow backbone (default pspnet = the reference's "
                         "headline config; vit is the TPU extension — the "
                         "reference cannot run it in the flow path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache: first-ever run pays ~5-8 min of XLA compile
    # for the fused clip program; later runs start in seconds
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/floodseg_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from floodseg_tpu.data import FlowDataset, DataLoader, build_test_transform
    from floodseg_tpu.data.synthetic import generate_synthetic_dataset
    from floodseg_tpu.models import build_model
    from floodseg_tpu.train.flow import make_flow_predict_fn
    from floodseg_tpu.video.grid import default_grid

    # the tunneled TPU backend occasionally fails to register transiently;
    # retry before giving up
    dev = None
    for attempt in range(5):
        try:
            dev = jax.devices()[0]
            break
        except RuntimeError as e:
            log(f"device init attempt {attempt + 1} failed: {e}")
            time.sleep(10)
    if dev is None:
        raise SystemExit("no accelerator available")
    log(f"device: {dev.device_kind} ({dev.platform})")

    # hermetic 512px clip data with real MV->grid warps
    root = os.path.join(tempfile.gettempdir(), "floodseg_bench_512")
    marker = os.path.join(root, ".complete")
    if not os.path.exists(marker):
        log("generating synthetic 512px dataset...")
        generate_synthetic_dataset(
            root, num_frames=(CLIPS_TIMED + 2) * FRAME_DELTA + 1,
            size=(512, 512), frame_delta=FRAME_DELTA, num_labeled=4,
        )
        open(marker, "w").close()

    # frames travel to the device as raw resized pixels (float32 of uint8
    # range); mean/std normalization is fused into the compiled program —
    # the host->HBM link through the tunnel is the scarce resource
    size = SIZE if args.arch == "pspnet" else 512  # 8k+1 vs 32-multiple
    tf = build_test_transform(resize=(size, size), normalize=False)
    ds = FlowDataset("predict", root, type="u", transform=tf,
                     frame_delta=FRAME_DELTA, predict_v_id="synth")

    def device_put(batch):
        # pack the four per-clip arrays into TWO transfers (frames uint8,
        # grids f32) — each device_put is a tunnel round-trip, and at these
        # sizes (~1.6 MB frames, ~0.4 MB grids) latency, not bandwidth, is
        # what the streaming loop pays
        out = {k: v for k, v in batch.items() if k.endswith("frame_id")}
        # (frame ids stay host-side: reading them back from the device for
        # the continuity check would cost 2 RTTs inside the timed loop)
        frames = np.stack([batch["frame_prev"], batch["frame_next"]])
        out["frames"] = jax.device_put(frames.astype(np.uint8))
        out["mvs"] = jax.device_put(
            np.stack([batch["mvs_left"], batch["mvs_right"]]))
        return out

    loader = DataLoader(ds, batch_size=1, num_workers=8, prefetch=4,
                        device_put=device_put)

    model = build_model(args.arch, classes=5, layers=50, with_aux=False,
                        image_size=size, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    )()
    variables = jax.device_put(variables)

    # int8 decoder resolution mirrors the product default
    # (Runner._int8_decode): AUTO = on for the pspnet SegHead when the
    # backend has the 2x int8 MXU rate, unless forced either way
    if args.int8 and args.no_int8:
        raise SystemExit("--int8 and --no-int8 are mutually exclusive")
    from floodseg_tpu.ops.quant import int8_auto_default
    use_int8 = args.int8 or (not args.no_int8 and int8_auto_default(args.arch))
    log(f"int8 decode: {use_int8}")

    bh, bw = 512 // 16, 512 // 16
    from floodseg_tpu.train.flow import make_cached_flow_predict_fn
    if args.int8_enc:
        log("int8 encode: True")
    if args.out_size:
        oh, ow = (int(v) for v in args.out_size.lower().split("x"))
        out_size = (oh, ow)
        log(f"predict out_size: {out_size}")
    else:
        out_size = (size, size)
    base_full, base_cached = make_cached_flow_predict_fn(
        model, n=FRAME_DELTA, feature_based=True,
        out_size=out_size, default_grid=default_grid(bh * 16, bw * 16),
        int8_decode=use_int8, int8_encode=args.int8_enc,
    )
    from floodseg_tpu.data.transforms import MEAN, STD
    mean = jnp.asarray(MEAN, jnp.float32)
    std = jnp.asarray(STD, jnp.float32)

    def norm(x):
        return (x.astype(jnp.float32) - mean) / std

    @jax.jit
    def full_fn(variables, frames, mvs):
        return base_full(variables, norm(frames[0]), norm(frames[1]),
                         mvs[0], mvs[1])

    @jax.jit
    def cached_fn(variables, feat, frames, mvs):
        return base_cached(variables, feat, norm(frames[1]), mvs[0], mvs[1])

    batches = list(loader)
    log(f"{len(batches)} clips of {FRAME_DELTA} frames")

    def make_runner(full_fn, cached_fn):
        state = {"feat": None, "next_id": None}

        def run(batch, first=False):
            # key-feature reuse needs window k's RESOLVED next key == window
            # k+1's resolved prev key; on a video with missing frames (the
            # nearest-existing fallback) continuity can break — fall back to
            # a full encode for that window, exactly like run_predict does
            pfid = int(np.asarray(batch["prev_frame_id"])[0])
            if first or state["feat"] is None or pfid != state["next_id"]:
                out, feat = full_fn(variables, batch["frames"], batch["mvs"])
            else:
                out, feat = cached_fn(variables, state["feat"],
                                      batch["frames"], batch["mvs"])
            state["feat"] = feat
            state["next_id"] = int(np.asarray(batch["next_frame_id"])[0])
            return out

        return run, state

    run, state = make_runner(full_fn, cached_fn)

    def force(o):
        # a scalar readback is the only reliable execution barrier over the
        # tunneled runtime (device stream is in-order, so fetching the last
        # output's sum proves every queued clip finished)
        return int(jnp.sum(o))

    def warm(run):
        # warm the cached program UNCONDITIONALLY (run(batches[1]) would
        # skip it if frame-id continuity happened to break at this boundary,
        # pushing a multi-second XLA compile into the timed region), then
        # restore the cache to batches[0]'s next-key features so the timed
        # region starts with the CORRECT feat
        out = run(batches[0], first=True)
        force(out)
        out2 = run(batches[1])
        force(out2)
        force(run(batches[0], first=True))
        return out

    timed = batches[1:1 + CLIPS_TIMED]

    def time_passes(run, n_passes, trace_dir=None):
        # repeat protocol (VERDICT r4): one pass is indistinguishable from
        # tunnel-RTT noise; run n_passes over the same clips and report the
        # distribution. Pass 2+ starts with a full_fn clip (the sequence
        # wraps, breaking frame-id continuity) — identical across passes,
        # so the medians stay comparable.
        import contextlib
        fps_list = []
        for p in range(n_passes):
            cm = contextlib.nullcontext()
            if trace_dir and p == 0:
                cm = jax.profiler.trace(trace_dir)
                log(f"tracing pass 1 to {trace_dir}")
            t0 = time.perf_counter()
            with cm:
                for b in timed:
                    out = run(b)
                force(out)
            dt = time.perf_counter() - t0
            fps_list.append(len(timed) * FRAME_DELTA / dt)
            log(f"pass {p + 1}/{n_passes}: {fps_list[-1]:.1f} frames/s")
        return fps_list

    t0 = time.perf_counter()
    out = warm(run)
    compile_s = time.perf_counter() - t0
    log(f"compile+first clip: {compile_s:.1f}s, out {out.shape} {out.dtype}")

    fps_passes = time_passes(run, PASSES, trace_dir=args.trace)
    fps = float(np.median(fps_passes))
    log(f"median {fps:.1f} / min {min(fps_passes):.1f} / "
        f"max {max(fps_passes):.1f} frames/s over {PASSES} passes")

    extras = {}

    # pallas resize+quantize kernel A-B (VERDICT r4): the headline runs the
    # DEFAULT programs (kernel off since r5 — the first A-B measured the
    # kernel 9% slower end-to-end, the cause of the r4 918->801 regression);
    # rebuild with FLOODSEG_PALLAS_RESIZE=1 (read at trace time) and re-time
    # so the JSON keeps carrying the on/off delta
    kernel_was_enabled = bool(os.environ.get("FLOODSEG_PALLAS_RESIZE"))
    kernel_active = use_int8 and jax.default_backend() == "tpu"
    if (kernel_active and compile_s > 300 and not args.no_ab
            and not kernel_was_enabled):
        # Degraded-tunnel guard: the A-B costs a SECOND full compile. When
        # the first one took >5 min (relay-side slowness, observed 10x
        # swings), skip the A-B so the headline number still lands within
        # any outer timeout; the delta is a stable program property
        # (measured -81 fps, see README) not worth re-paying a slow compile
        # for every run.
        log(f"skipping kernel A-B: first compile took {compile_s:.0f}s "
            "(degraded tunnel); headline passes are unaffected")
        extras["kernel_ab_skipped"] = f"compile {compile_s:.0f}s > 300s"
        args.no_ab = True
    if kernel_active and not args.no_ab and not kernel_was_enabled:
        os.environ["FLOODSEG_PALLAS_RESIZE"] = "1"
        try:
            on_bf, on_bc = make_cached_flow_predict_fn(
                model, n=FRAME_DELTA, feature_based=True,
                out_size=out_size,
                default_grid=default_grid(bh * 16, bw * 16),
                int8_decode=use_int8, int8_encode=args.int8_enc,
            )
            on_full = jax.jit(lambda v, frames, mvs: on_bf(
                v, norm(frames[0]), norm(frames[1]), mvs[0], mvs[1]))
            on_cached = jax.jit(lambda v, feat, frames, mvs: on_bc(
                v, feat, norm(frames[1]), mvs[0], mvs[1]))
            on_run, _ = make_runner(on_full, on_cached)
            t0 = time.perf_counter()
            warm(on_run)
            log(f"A-B (kernel on) compile: {time.perf_counter() - t0:.1f}s")
            on_passes = time_passes(on_run, 3)
            on_med = float(np.median(on_passes))
            extras["fps_resize_kernel_on"] = round(on_med, 2)
            extras["kernel_delta"] = round(on_med - fps, 2)
            log(f"pallas resize kernel: off(default) {fps:.1f} / on "
                f"{on_med:.1f} -> delta {on_med - fps:+.1f} frames/s")
        finally:
            del os.environ["FLOODSEG_PALLAS_RESIZE"]

    if args.epilogue_ab:
        # 2x2 epilogue matrix at out_size (VERDICT r4: the production
        # 1072x1920 emission was never A-B'd at its real shape): fused
        # channels-first resize_argmax vs the unfused argmax(resize)
        # composition, each with the pallas resize+quantize kernel on/off
        matrix = {"fused+nopallas": round(fps, 2)}  # == the default program
        cells = [(True, True), (False, True), (False, False)]
        for fused, pallas in cells:
            if pallas:
                os.environ["FLOODSEG_PALLAS_RESIZE"] = "1"
            try:
                bf, bc = make_cached_flow_predict_fn(
                    model, n=FRAME_DELTA, feature_based=True,
                    out_size=out_size,
                    default_grid=default_grid(bh * 16, bw * 16),
                    int8_decode=use_int8, int8_encode=args.int8_enc,
                    fused_argmax=fused,
                )
                e_full = jax.jit(lambda v, frames, mvs, bf=bf: bf(
                    v, norm(frames[0]), norm(frames[1]), mvs[0], mvs[1]))
                e_cached = jax.jit(lambda v, feat, frames, mvs, bc=bc: bc(
                    v, feat, norm(frames[1]), mvs[0], mvs[1]))
                e_run, _ = make_runner(e_full, e_cached)
                warm(e_run)
                med = float(np.median(time_passes(e_run, 3)))
                key = (("fused" if fused else "unfused")
                       + ("+pallas" if pallas else "+nopallas"))
                matrix[key] = round(med, 2)
                log(f"epilogue {key}: {med:.1f} frames/s")
            finally:
                os.environ.pop("FLOODSEG_PALLAS_RESIZE", None)
        extras["epilogue_ab"] = matrix
        extras["epilogue_out_size"] = f"{out_size[0]}x{out_size[1]}"

    if args.streaming:
        # end-to-end fps: loader (jpg decode + resize + host->device through
        # the tunnel) INSIDE the timed loop. The prefetching producer threads
        # overlap IO with compute, so this measures the realistic pipeline,
        # not loader latency stacked on compute latency.
        s_loader = DataLoader(ds, batch_size=1, num_workers=8, prefetch=4,
                              device_put=device_put)
        state["feat"], state["next_id"] = None, None
        n_clips = 0
        # steady-state convention: the clock starts when the FIRST batch
        # arrives (producer-thread spin-up and initial queue fill are
        # one-time costs that would dominate a short stream), and from then
        # on every decode/transfer/compute is inside the timed region
        t0 = None
        for b in s_loader:
            if t0 is None:
                t0 = time.perf_counter()
            out = run(b, first=(n_clips == 0))
            n_clips += 1
        force(out)
        dt_s = time.perf_counter() - t0
        extras["streaming_fps"] = round(n_clips * FRAME_DELTA / dt_s, 2)
        log(f"streaming: {n_clips * FRAME_DELTA} frames in {dt_s:.3f}s -> "
            f"{extras['streaming_fps']} frames/s (loader in loop)")

        # per-clip per-stage breakdown (VERDICT r4): isolate each host
        # stage serially on the same clips and publish medians, so the
        # model-only vs streaming gap is attributable to a stage (or, by
        # elimination, to tunnel RTT). The producer thread overlaps
        # jpg/npy/transform with device compute, so the pipeline's
        # steady-state clip time ~ max(serial host tail, device compute)
        # where the serial tail = collate + device_put (single-threaded in
        # the loader by design — see data/loader.py).
        from floodseg_tpu.data.dataset import collate as _collate

        def _med_ms(f, args_list):
            ts = []
            for a in args_list:
                t1 = time.perf_counter()
                f(a)
                ts.append((time.perf_counter() - t1) * 1e3)
            return round(float(np.median(ts)), 2)

        n_bd = min(6, len(ds))
        idxs = list(range(n_bd))
        bd = {}
        bd["item_load_ms"] = _med_ms(
            lambda i: ds.get(i, np.random.default_rng((0, 0, i))), idxs)
        from floodseg_tpu.data.dataset import _imread
        vid = ds.video_id
        bd["jpg_decode_ms"] = _med_ms(
            lambda i: (_imread(ds.frame_path(vid, i * FRAME_DELTA)),
                       _imread(ds.frame_path(vid, (i + 1) * FRAME_DELTA))),
            idxs)
        bd["grid_npy_ms"] = _med_ms(
            lambda i: [ds._load_grid(vid, i * FRAME_DELTA + k + 1, name)
                       for k in range(FRAME_DELTA - 1)
                       for name in ("grids", "inv_grids")], idxs)
        items = [ds.get(i, np.random.default_rng((0, 0, i))) for i in idxs]
        bd["transform_ms"] = round(
            max(0.0, bd["item_load_ms"] - bd["jpg_decode_ms"]
                - bd["grid_npy_ms"]), 2)
        bd["collate_ms"] = _med_ms(lambda i: _collate([items[i]]), idxs)
        host_batches = [_collate([items[i]]) for i in idxs]
        bd["device_put_ms"] = _med_ms(
            lambda i: jax.block_until_ready(
                tuple(v for v in device_put(host_batches[i]).values()
                      if hasattr(v, "block_until_ready"))), idxs)
        bd["device_compute_ms_per_clip"] = round(1000 * FRAME_DELTA / fps, 2)
        extras["streaming_breakdown"] = bd
        log(f"streaming breakdown (ms/clip medians): {bd}")

    if args.multiclip == 1:
        log("--multiclip 1 is the default single-clip path; "
            "pass B >= 2 to measure the batched-window variant")
    if args.multiclip > 1 and len(batches) - 1 < args.multiclip:
        log(f"--multiclip {args.multiclip} skipped: only {len(batches) - 1} "
            "clip windows available after the compile batch")
    elif args.multiclip > 1:
        B = args.multiclip
        # B windows per dispatch: vmap the whole window program over a new
        # leading clip axis — the encoder/decoder convs then run at batch
        # 2B / B*n, amortizing dispatch and padding small batch dims
        multi_fn = jax.jit(jax.vmap(
            lambda v, frames, mvs: base_full(v, norm(frames[0]),
                                             norm(frames[1]),
                                             mvs[0], mvs[1]),
            in_axes=(None, 0, 0)))

        groups = []
        pool = batches[1:1 + (len(batches[1:]) // B) * B]
        for i in range(0, len(pool), B):
            chunk = pool[i:i + B]
            groups.append(tuple(
                jnp.stack([jnp.asarray(c[k]) for c in chunk])
                for k in ("frames", "mvs")))
        outm, _ = multi_fn(variables, *groups[0])
        force(outm)  # compile
        t0 = time.perf_counter()
        for g in groups:
            outm, _ = multi_fn(variables, *g)
        force(outm)
        dt_m = time.perf_counter() - t0
        fr = len(groups) * B * FRAME_DELTA
        extras["multiclip_fps"] = round(fr / dt_m, 2)
        extras["multiclip_B"] = B
        log(f"multiclip B={B}: {fr} frames in {dt_m:.3f}s -> "
            f"{extras['multiclip_fps']} frames/s (no key-feature reuse)")

    if args.streams == 1:
        log("--streams 1 is the default single-stream path (the headline "
            "fps); pass B >= 2 to measure B concurrent streams with "
            "per-lane key reuse")
    if args.streams > 1:
        B = args.streams
        # one program advances all B lanes one window; each lane carries its
        # own cached key features, so per-lane work is identical to the
        # single-stream cached path while the encoder/decoder convs run at
        # B x the batch. Lanes replay the same clip sequence with DISTINCT
        # uint8 payloads (+lane id, wrapping) — identical compute cost, but
        # the tunnel relay can't dedupe transfers or results.
        mfull = jax.jit(jax.vmap(
            lambda v, frames, mvs: base_full(v, norm(frames[0]),
                                             norm(frames[1]),
                                             mvs[0], mvs[1]),
            in_axes=(None, 0, 0)))
        mcached = jax.jit(jax.vmap(
            lambda v, feat, frames, mvs: base_cached(v, feat,
                                                     norm(frames[1]),
                                                     mvs[0], mvs[1]),
            in_axes=(None, 0, 0, 0)))

        def lanes(batch):
            f = np.asarray(batch["frames"])
            fr = jnp.stack([(f + b).astype(np.uint8) for b in range(B)])
            mv = jnp.broadcast_to(jnp.asarray(batch["mvs"]),
                                  (B,) + batch["mvs"].shape)
            return jax.device_put(fr), jax.device_put(mv)

        wins = [lanes(b) for b in [batches[0]] + list(timed)]
        outs, sfeat = mfull(variables, *wins[0])
        force(outs)
        outs, _ = mcached(variables, sfeat, *wins[1])
        force(outs)  # compile both programs outside the timed region
        outs, sfeat = mfull(variables, *wins[0])
        force(outs)
        t0 = time.perf_counter()
        for w in wins[1:]:
            outs, sfeat = mcached(variables, sfeat, *w)
        force(outs)
        dt_b = time.perf_counter() - t0
        fr = len(wins[1:]) * B * FRAME_DELTA
        extras["streams_fps"] = round(fr / dt_b, 2)
        extras["streams_B"] = B
        log(f"streams B={B}: {fr} frames in {dt_b:.3f}s -> "
            f"{extras['streams_fps']} frames/s (per-lane key reuse)")

    if args.arch != "pspnet":
        extras["arch"] = args.arch
    extras["int8_decode"] = bool(use_int8)
    if args.int8_enc:
        extras["int8_encode"] = True
    print(json.dumps({
        "metric": "segmented_frames_per_sec_per_chip_512px_keyframe_interp",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
        "protocol": f"median of {PASSES} passes x {CLIPS_TIMED} clips",
        "fps_passes": [round(f, 1) for f in fps_passes],
        "fps_min": round(min(fps_passes), 2),
        "fps_max": round(max(fps_passes), 2),
        "fps_spread_pct": round(100.0 * (max(fps_passes) - min(fps_passes))
                                / fps, 1),
        **extras,
    }))


if __name__ == "__main__":
    main()
