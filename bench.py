"""Benchmark: closed-loop action prediction rate on one TPU chip.

Measures the per-step control path of the flagship model — the generated
4L/64d base policy ViT over DINOv2-base patch features (bfloat16 trunk) +
mix action head — exactly what runs every control step after the hypernetwork
emitted the episode's weights.

Serving optimizations exercised here:
  * bfloat16 compute in the DINOv2 trunk (params stay fp32);
  * no attention-map capture (and no flash attention: measured slower at
    bs=1 — see PERF.md);
  * percentile reporting across timing windows: the headline is the MEDIAN
    (p50) window on this multi-tenant chip; best and p90 ride in aux.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "actions/s", "vs_baseline": N}
vs_baseline is against the 1 kHz/chip north-star target from BASELINE.json.
"""
import json
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import os

    from hypervla_tpu.flagship import build_flagship
    from hypervla_tpu.models.base_network import BaseNetwork
    from hypervla_tpu.utils.jax_utils import initialize_compilation_cache

    initialize_compilation_cache()

    # Deadline guard: on a contended day the optional sections (batched
    # serving compiles, profiler capture, warm-probe subprocess) can push
    # the total past a driver's per-command budget and lose the headline
    # JSON line entirely. Optional sections skip (reporting null) once the
    # budget is spent; the headline loop always runs.
    bench_t0 = time.perf_counter()
    budget_s = float(os.environ.get("HYPERVLA_BENCH_BUDGET_S", "600"))

    def remaining_s():
        return budget_s - (time.perf_counter() - bench_t0)

    # skipped-section markers (ADVICE r3: a deliberate budget skip must be
    # distinguishable from a crash — both used to report bare null)
    skipped = {}

    def budget_skip(section, need_s):
        if remaining_s() < need_s:
            skipped[section] = (
                f"budget spent ({remaining_s():.0f}s left < {need_s}s)"
            )
            logging.warning("skipping %s: %s", section, skipped[section])
            return True
        return False

    # stderr phase markers: a hung or killed run pins itself to a phase in
    # whatever tail the caller captured (round-4: a driver-side timeout with
    # zero output was undiagnosable)
    import sys

    # shared progress state for the hard-deadline watchdog below: sections
    # deposit results here the moment they exist, so a partial emission is
    # possible from any point of the run
    shared = {"phase": "start", "procs": [], "skipped": skipped}

    def phase(msg):
        shared["phase"] = msg
        print(f"[bench {time.perf_counter() - bench_t0:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    # Hard-deadline watchdog (round 5): on degraded-tunnel days a section's
    # FIRST device execution can stall for many minutes with no way to
    # interrupt it from Python (one run had the batch8 warmup stall >820 s,
    # overrunning the outer command timeout — the whole artifact was lost,
    # headline included, even though the headline had been measured 15
    # minutes earlier). The budget guards only run BETWEEN sections; this
    # daemon thread guarantees the one-JSON-line contract from WITHIN a
    # stuck section: at budget + 270 s it kills the child processes, prints
    # the headline JSON with everything measured so far (the stuck phase
    # named in aux.hard_deadline), and exits 0.
    import threading

    done_event = threading.Event()
    # exactly one emitter wins: the final print and the watchdog's partial
    # emission both run under this lock, so the artifact is always exactly
    # one JSON line even when the deadline lands during the final print
    emit_lock = threading.Lock()
    hard_deadline_s = float(
        os.environ.get("HYPERVLA_BENCH_HARD_DEADLINE_S", budget_s + 270)
    )

    def _emit_partial():
        window_s = shared.get("window_s") or []
        if window_s:
            p50 = float(np.percentile(window_s, 50))
            value = round(1.0 / p50, 2)
            aux_head = {
                "per_step_ms_p50": round(1000.0 * p50, 3),
                "per_step_ms_p90": round(
                    1000.0 * float(np.percentile(window_s, 90)), 3
                ),
                "actions_per_sec_p90": round(
                    1.0 / float(np.percentile(window_s, 90)), 2
                ),
                "window_ms": [round(1000.0 * w, 3) for w in window_s],
            }
        else:
            value, aux_head = None, {}
        result = {
            "metric": "closed-loop actions/sec/chip p50 (generated "
            "base-net step, DINOv2-base bf16 + vit 4L/64d + mix head, "
            "bs=1)",
            "value": value,
            "unit": "actions/s",
            "vs_baseline": (
                round(value / 1000.0, 4) if value is not None else None
            ),
            "baseline_note": "vs_baseline = value / 1000 actions/s "
            "north-star target (no reference measurement exists); "
            "regime: p50",
            "aux": {
                **aux_head,
                **{k: shared[k] for k in (
                    "hypernet_gen_phases_s",
                    "device_ms_per_step", "tunnel",
                    "batch8_actions_per_sec", "multitask8_actions_per_sec",
                    "scan8_actions_per_sec",
                ) if k in shared},
                "serving_setup_phases_s": {
                    k: v
                    for k, v in shared.get(
                        "serving_setup_phases_s", {}
                    ).items()
                    if not k.startswith("_t0_")
                },
                "skipped_sections": dict(shared.get("skipped") or {}),
                "hard_deadline": {
                    "hit_at_s": round(time.perf_counter() - bench_t0, 1),
                    "stuck_phase": shared.get("phase"),
                    "note": "first device execution stalled past the "
                    "hard deadline (degraded-tunnel admission stall, "
                    "PERF.md round-5); partial artifact emitted by the "
                    "watchdog thread",
                },
            },
        }
        print(json.dumps(result), flush=True)

    def _watchdog():
        while not done_event.wait(timeout=5.0):
            if time.perf_counter() - bench_t0 >= hard_deadline_s:
                if done_event.is_set():
                    return
                for p in shared["procs"]:
                    try:
                        p.kill()
                    except Exception:
                        pass
                with emit_lock:
                    if done_event.is_set():
                        # the main thread finished while we were killing
                        # children: its final line is the artifact
                        return
                    try:
                        _emit_partial()
                    finally:
                        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    phase("building flagship model")
    build_t0 = time.perf_counter()
    model, batch = build_flagship(encoder_dtype="bfloat16", serving=True)
    build_s = time.perf_counter() - build_t0
    example = jax.tree_util.tree_map(lambda x: np.asarray(x)[:1], batch)
    instruction_dict = {
        "language_instruction": example["task"]["language_instruction"]
    }

    # one-time per-episode hypernet generation — phase-timed so a regression
    # like round 3's 311.8 s cold start pins itself to a phase (the culprit
    # there: eager per-leaf casts in prepare_serving_params, each a separate
    # compile RPC under tunnel contention; now single-jit programs)
    phase("create_tasks (hypernet generation)")
    gen_t0 = time.perf_counter()
    base_params, tasks, _ = model.create_tasks(
        instruction_dict=instruction_dict,
        initial_state=example["initial_state"],
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(base_params)[0])
    create_tasks_s = time.perf_counter() - gen_t0
    from hypervla_tpu.ops.serving import prepare_serving_params

    # once per episode: bake the pos-grid interpolation for 224px and store
    # the shared trunk in bf16 (the compute dtype) — see prepare_serving_params
    phase("prepare_serving_params")
    prep_t0 = time.perf_counter()
    base_params = prepare_serving_params(model, base_params, image_size=224)
    base_params = jax.device_put(base_params)
    jax.block_until_ready(jax.tree_util.tree_leaves(base_params)[0])
    prepare_s = time.perf_counter() - prep_t0
    gen_time_first = time.perf_counter() - gen_t0

    images = jax.device_put(example["observation"]["image_primary"])
    token_embedding = jax.device_put(
        example["task"]["language_instruction"]["token_embedding"]
    )
    pad_mask = jax.device_put(example["observation"]["timestep_pad_mask"])
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def step(base_params, images, token_embedding, pad_mask, rng):
        return model.base_net.apply(
            {"params": base_params},
            images.squeeze(1),
            token_embedding,
            pad_mask,
            rng=rng,
            rngs={"dropout": rng},
            train=False,
            method=BaseNetwork.predict_action,
        )

    # Stacked-weights trunk for the bs=1 headline loop; the batched paths
    # below keep the XLA step (the stacked trunks are bs=1).
    #   "scan" (default): XLA lax.scan over the stacked per-layer weights —
    #     the Pallas kernel's 4-handle dispatch surface and roundings with
    #     NO Mosaic custom call. Chosen because the Pallas program's FIRST
    #     execution through the tunneled backend costs ~583 s server-side
    #     when its program cache is cold (measured solo, round 5) — the
    #     attributed cause of the r3/r4 bench-budget blowouts; the scan
    #     trunk reaches full rate immediately in any process.
    #   "1"/"pallas": the Pallas weight-streaming kernel (ops/dino_layer.py)
    #     — best steady-state device residency, pays the one-time program
    #     load when the server cache is cold (8 s when warm).
    #   "0": plain XLA trunk (~190 leaves/tick dispatch surface).
    trunk_env = os.environ.get("HYPERVLA_TRUNK_KERNEL", "scan")
    trunk_map = {
        "1": "pallas", "pallas": "pallas", "scan": "scan",
        "unroll": "unroll", "0": "off",
    }
    if trunk_env not in trunk_map:
        logging.warning(
            "unrecognized HYPERVLA_TRUNK_KERNEL=%r; using 'scan' "
            "(valid: %s)", trunk_env, sorted(trunk_map),
        )
    trunk_impl = trunk_map.get(trunk_env, "scan")
    trunk_kernel = trunk_impl != "off"
    pack_args = os.environ.get("HYPERVLA_PACK_ARGS", "1") == "1"
    # fine-grained phase durations for the trunk-kernel setup region —
    # VERDICT r4: ~420 s of the r4 driver run sat between
    # prepare_serving_params and the timing windows with no attribution in
    # the artifact; every sub-phase now lands in aux.serving_setup_phases_s
    setup_phases = {}
    shared["serving_setup_phases_s"] = setup_phases
    shared["hypernet_gen_phases_s"] = {
        "model_build": round(build_s, 3),
        "create_tasks": round(create_tasks_s, 3),
        "prepare_serving_params": round(prepare_s, 3),
    }

    def timed_phase(name):
        phase(name)
        setup_phases["_t0_" + name] = time.perf_counter()

    def end_phase(name):
        setup_phases[name] = round(
            time.perf_counter() - setup_phases.pop("_t0_" + name), 3
        )
    if trunk_kernel:
        try:
            from hypervla_tpu.ops.serving import (
                make_arg_packer,
                make_pallas_trunk_net,
            )

            timed_phase("trunk_net_build")
            from hypervla_tpu.ops.serving import resolve_trunk_impl

            serve_net, variables = make_pallas_trunk_net(
                model, base_params, impl=resolve_trunk_impl(trunk_impl),
            )
            variables = jax.device_put(variables)
            jax.block_until_ready(
                jax.tree_util.tree_leaves(variables)[0]
            )
            end_phase("trunk_net_build")
            if pack_args:
                # fold the ~80 tiny leaves AND the episode constants (token
                # embedding, pad mask, rng — all fixed for the episode; the
                # argmax decode never consumes the rng) into per-dtype flat
                # buffers: a tick dispatches packed{f32,bf16} + trunk stack
                # + image = 4 handles. Interleaved A/B (PERF.md r3/r4):
                # params-only packing took p90 1.421 -> 0.872 ms; folding
                # the constants shaves the remaining 3 handles/tick.
                episode = {
                    "vars": variables,
                    "tok": token_embedding,
                    "mask": pad_mask,
                    "rng": jax.random.key_data(rng),
                }
                timed_phase("arg_pack")
                pack, unpack = make_arg_packer(episode, coerce=True)
                packed, big = pack(episode)
                packed = jax.device_put(packed)
                big = jax.device_put(big)
                jax.block_until_ready(packed)
                end_phase("arg_pack")

                @jax.jit
                def kernel_step(packed, big, images):
                    ep = unpack(packed, big)
                    key = jax.random.wrap_key_data(ep["rng"])
                    return serve_net.apply(
                        ep["vars"],
                        images.squeeze(1),
                        ep["tok"],
                        ep["mask"],
                        rng=key,
                        rngs={"dropout": key},
                        train=False,
                        method=BaseNetwork.predict_action,
                    )

                # the jit call returns once trace+lower+compile finished
                # (execution is dispatched async) -> three separately-timed
                # sub-phases attribute compile vs first-execution vs fetch
                timed_phase("kernel_compile")
                a = kernel_step(packed, big, images)
                end_phase("kernel_compile")
                timed_phase("kernel_first_exec")
                jax.block_until_ready(a)
                end_phase("kernel_first_exec")
                timed_phase("kernel_first_fetch")
                np.asarray(a)
                end_phase("kernel_first_fetch")

                def headline_step(images, token_embedding, pad_mask, rng):
                    return kernel_step(packed, big, images)
            else:
                @jax.jit
                def kernel_step(variables, images, token_embedding, pad_mask,
                                rng):
                    return serve_net.apply(
                        variables,
                        images.squeeze(1),
                        token_embedding,
                        pad_mask,
                        rng=rng,
                        rngs={"dropout": rng},
                        train=False,
                        method=BaseNetwork.predict_action,
                    )

                timed_phase("kernel_compile")
                a = kernel_step(variables, images, token_embedding, pad_mask,
                                rng)
                end_phase("kernel_compile")
                timed_phase("kernel_first_exec")
                jax.block_until_ready(a)
                end_phase("kernel_first_exec")

                def headline_step(images, token_embedding, pad_mask, rng):
                    return kernel_step(variables, images, token_embedding,
                                       pad_mask, rng)
        except Exception as exc:  # fall back to the XLA trunk
            logging.warning("trunk kernel unavailable (%s); XLA path", exc)
            trunk_kernel = False
            trunk_impl = "off"
    if not trunk_kernel:
        def headline_step(images, token_embedding, pad_mask, rng):
            return step(base_params, images, token_embedding, pad_mask, rng)

    # warmup + compile (the XLA `step` is compiled lazily by the batch8
    # section — when the Pallas kernel serves the headline there is no need
    # to pay that compile before the timing windows)
    timed_phase("warmup")
    action = headline_step(images, token_embedding, pad_mask, rng)
    jax.block_until_ready(action)
    end_phase("warmup")
    # burn-in with a true host FETCH: through tunneled backends
    # block_until_ready can return before lazy first-call work (AOT
    # serialization, allocator growth, a co-tenant backlog) has drained —
    # in one round-4 run that backlog landed in timing window 1 as a
    # 3.8 s/step outlier that ate 300 s of the bench budget
    timed_phase("fetched burn-in")
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(headline_step(images, token_embedding, pad_mask, rng))
        setup_phases[f"burn_in_{i}"] = round(time.perf_counter() - t0, 3)
    end_phase("fetched burn-in")

    # timing windows spread over ~30s: multi-tenant contention comes in
    # multi-second bursts, so percentiles over windows describe what a user
    # actually gets (VERDICT round-1: report p50/p90, not best-of).
    # 25 windows of 80 steps (vs 10x200 through round 3): with 10 windows a
    # single co-tenant burst WAS the p90 (BENCH_r03's 1007 actions/s p90;
    # one 20 s stall observed in round-4 reruns took p90 to 9.7/s) — with 25
    # windows the p90 tolerates two burst-hit windows while total on-device
    # work stays the same. The loop is also wall-clock capped so a hard
    # multi-minute stall degrades to fewer windows instead of eating the
    # whole budget.
    phase("timing windows")
    n_iters, n_trials = 80, 25
    windows_t0 = time.perf_counter()
    windows_cap_s = min(150.0, max(60.0, 0.4 * budget_s))
    window_s = []
    shared["window_s"] = window_s  # appended in place; watchdog-visible
    for _ in range(n_trials):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            action = headline_step(images, token_embedding, pad_mask, rng)
        # fetch (not just block_until_ready): through tunneled backends
        # block_until_ready can return before execution completes, while a
        # host fetch of the last step forces the whole in-order stream
        np.asarray(action)
        window_s.append((time.perf_counter() - t0) / n_iters)
        if time.perf_counter() - windows_t0 > windows_cap_s:
            skipped["windows"] = (
                f"stopped after {len(window_s)}/{n_trials} windows "
                f"(wall cap {windows_cap_s:.0f}s)"
            )
            break
        time.sleep(0.5)
    best = min(window_s)
    p50 = float(np.percentile(window_s, 50))
    p90 = float(np.percentile(window_s, 90))

    # The two FRESH-PROCESS sections (warm-start probe, train step) launch
    # here CONCURRENTLY and are collected at the end. Measured round 5: on
    # a degraded-tunnel day a fresh process pays a 150-460 s server-side
    # admission/program-load stall before its first execution completes, so
    # run serially these sections can never fit the budget (the train
    # subprocess timed out at 300 s in two consecutive runs WITH a warm
    # persistent compile cache). Run concurrently, their stall/compile wall
    # time overlaps the in-process sections below, and their actual chip
    # work (~2 s gen + ~7 accumulation steps) is too small to pollute the
    # sections' timing loops. The headline windows above are already done,
    # so the headline is never contended.
    import subprocess
    import tempfile

    def launch(name, argv, need_s):
        """Popen with FILE-backed stdio: a PIPE left undrained until the
        end-of-run collect blocks the child as soon as it writes 64 KB,
        stalling it for exactly the wall time the concurrency was meant
        to reclaim."""
        try:
            phase(f"launch {name} (concurrent subprocess)")
            if budget_skip(name, need_s):
                return None
            out = tempfile.TemporaryFile(mode="w+", prefix=f"bench_{name}_")
            err = tempfile.TemporaryFile(mode="w+", prefix=f"bench_{name}_")
            proc = subprocess.Popen(argv, stdout=out, stderr=err, text=True)
            proc._bench_files = (out, err)
            shared["procs"].append(proc)  # watchdog kills these on deadline
            return proc
        except Exception as exc:
            logging.warning("%s launch failed: %s", name, exc)
            return None

    warm_gen_s = None
    train_aux = None
    warm_proc = launch(
        "warm_probe", [sys.executable, "-m", "scripts.aot_warm_probe"], 30
    )
    # the real single-jit GSPMD train step at the eff-256 recipe (bs=64 x 4
    # accum, fast preset + frozen-encoder layer kernel — the PERF.md
    # round-4 winner) for a handful of updates
    train_proc = launch(
        "train_step",
        [sys.executable, "-m", "scripts.bench_train",
         "--batch", "64", "--accum", "4", "--fast", "--frozen-kernel",
         "--steps", "3", "--warmup", "1", "--trials", "2"],
        60,
    )

    # device-true time via a short profiler capture (read with the in-repo
    # TensorBoard-free xplane parser) — separates the program's cost from
    # shared-host dispatch overhead. Runs FIRST among the heavier optional
    # sections (VERDICT r4 item 2b: device_ms_per_step was null two rounds
    # running, so a wall-clock regression could not be attributed to chip
    # contention vs program cost).
    device_ms = None
    try:
        phase("device profiler section")
        if budget_skip("device_profile", 60):
            raise TimeoutError("bench budget spent; skipping device profile")
        import glob
        import shutil
        import tempfile

        from hypervla_tpu.utils.xplane import module_time_ms

        trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
        jax.profiler.start_trace(trace_dir)
        for _ in range(10):
            action = headline_step(images, token_embedding, pad_mask, rng)
        jax.block_until_ready(action)
        jax.profiler.stop_trace()
        pbs = sorted(
            glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
        )
        if pbs:
            mods = module_time_ms(pbs[-1])
            # highest-count match: the 10-iteration headline program (a
            # concurrently-launched subprocess could contribute its own
            # "step"-named module with 1-2 executions)
            best_count = 0
            for name, (ms, count) in mods.items():
                if "step" in name and count > best_count:
                    device_ms = ms / count
                    best_count = count
        if device_ms is not None:
            shared["device_ms_per_step"] = round(device_ms, 3)
        shutil.rmtree(trace_dir, ignore_errors=True)
    except Exception as exc:
        logging.warning("device profiler section failed: %s", exc)

    # batched serving: device time is dominated by reading the DINO weights
    # once per step, so batching environments multiplies actions/s — the
    # production-serving configuration (one task, N concurrent envs)
    batch8_actions_per_sec = None
    try:
        phase("batch8 section")
        if budget_skip("batch8", 90):
            raise TimeoutError("bench budget spent; skipping batch8")
        images8 = jnp.tile(images, (8, 1, 1, 1, 1))
        emb8 = jnp.tile(token_embedding, (8, 1, 1))
        mask8 = jnp.tile(pad_mask, (8, 1))
        params8 = base_params  # same task -> same generated weights
        a8 = step(params8, images8, emb8, mask8, rng)
        jax.block_until_ready(a8)
        t0 = time.perf_counter()
        for _ in range(100):
            a8 = step(params8, images8, emb8, mask8, rng)
        np.asarray(a8)  # fetch: forces the in-order stream (see above)
        batch8_actions_per_sec = 8 * 100 / (time.perf_counter() - t0)
        shared["batch8_actions_per_sec"] = round(batch8_actions_per_sec, 1)
    except Exception as exc:
        logging.warning("batch8 section failed: %s", exc)

    # multi-task batched serving: 8 DIFFERENT generated policies vmapped in
    # one program (generated leaves batched, shared DINO trunk read once)
    multitask8_actions_per_sec = None
    try:
        phase("multitask8 section")
        if budget_skip("multitask8", 90):
            raise TimeoutError("bench budget spent; skipping multitask8")
        from hypervla_tpu.ops.serving import make_multitask_serving_step

        stats = {"mean": np.zeros(7), "std": np.ones(7)}
        multi, multi_init, stack = make_multitask_serving_step(
            model, stats, image_size=224, crop=False, ensemble=False
        )
        stacked = stack([base_params] * 8)
        frames8 = jnp.tile(
            example["observation"]["image_primary"][0, 0][None], (8, 1, 1, 1)
        )
        emb8 = jnp.tile(token_embedding, (8, 1, 1))
        hist8 = jnp.stack([multi_init()] * 8)
        idx8 = jnp.zeros(8, jnp.int32)
        rngs8 = jax.random.split(rng, 8)
        a8, hist8 = multi(stacked, frames8, emb8, hist8, idx8, rngs8)
        jax.block_until_ready(a8)
        t0 = time.perf_counter()
        for _ in range(100):
            a8, hist8 = multi(stacked, frames8, emb8, hist8, idx8, rngs8)
        np.asarray(a8)  # fetch: forces the in-order stream (see above)
        multitask8_actions_per_sec = 8 * 100 / (time.perf_counter() - t0)
        shared["multitask8_actions_per_sec"] = round(
            multitask8_actions_per_sec, 1
        )
    except Exception as exc:
        logging.warning("multitask8 section failed: %s", exc)

    # K-tick scan serving (VERDICT r4 item 8): amortize the per-dispatch
    # host cost over K=8 control ticks with one lax.scan program (action
    # ensembler in-graph) — wall rate approaches the device-true rate
    # (1440-1620 actions/s across rounds) instead of the dispatch-bound
    # per-tick wall rate
    scan8_actions_per_sec = None
    try:
        phase("scan-k8 section")
        if budget_skip("scan8", 90):
            raise TimeoutError("bench budget spent; skipping scan8")
        from hypervla_tpu.ops.serving import make_scan_serving_step

        stats8 = {"mean": np.zeros(7), "std": np.ones(7)}
        K = 8
        scan_step, scan_init = make_scan_serving_step(
            model, stats8, K, image_size=224, crop=False,
            ensemble=True,
            trunk_kernel={
                "scan": "scan", "unroll": "unroll", "pallas": True,
                "off": False,
            }[trunk_impl],
            pack_args=True,
        )
        scan_params = variables if trunk_kernel else base_params
        packed_ep = scan_step.pack_params(scan_params, token_embedding, rng)
        frames_k = jnp.tile(
            jnp.asarray(
                example["observation"]["image_primary"][0, 0], jnp.uint8
            )[None],
            (K, 1, 1, 1),
        )
        hist = scan_init()
        a_k, hist = scan_step(packed_ep, frames_k, hist, jnp.int32(0))
        jax.block_until_ready(a_k)
        iters = 50
        t0 = time.perf_counter()
        idx = jnp.int32(K)
        for _ in range(iters):
            a_k, hist = scan_step(packed_ep, frames_k, hist, idx)
        np.asarray(a_k)  # fetch: forces the in-order stream
        scan8_actions_per_sec = K * iters / (time.perf_counter() - t0)
        shared["scan8_actions_per_sec"] = round(scan8_actions_per_sec, 1)
    except Exception as exc:
        logging.warning("scan8 section failed: %s", exc)

    # tunnel/chip health: a BYTE-STABLE trivial program in a fresh
    # subprocess isolates the backend's per-dispatch roundtrip from any
    # hypervla program. On degraded-tunnel days (2026-08-21: fresh
    # programs paid a 257-700 s server-side first-execution load and
    # steady roundtrips were 35-60 ms vs the healthy ~1 ms) this field is
    # what attributes a slow headline to the transport instead of the
    # program. Runs LAST among the in-process sections and with a tight
    # cap: its own fresh-process admission stall can hit the same
    # pathology it measures, and "timed out" IS the attribution — it does
    # not need minutes to say so.
    tunnel_aux = None
    try:
        phase("tunnel probe (fresh subprocess)")
        if not budget_skip("tunnel_probe", 30):
            out = subprocess.run(
                [sys.executable, "-m", "scripts.tunnel_probe"],
                capture_output=True, text=True,
                timeout=max(60, min(120, remaining_s())),
            )
            tunnel_aux = json.loads(out.stdout.strip().splitlines()[-1])
    except subprocess.TimeoutExpired:
        tunnel_aux = {"error": "probe timed out: tunnel severely degraded"}
        logging.warning("tunnel probe timed out")
    except Exception as exc:
        logging.warning("tunnel probe failed: %s", exc)
    if tunnel_aux is not None:
        shared["tunnel"] = tunnel_aux

    # collect the two concurrent subprocesses launched after the windows.
    # Whatever budget is left is their deadline (with a floor: most of
    # their wall time already overlapped the sections above).
    def collect(proc, name, floor_s):
        if proc is None:
            return None
        out_f, err_f = proc._bench_files
        try:
            phase(f"collect {name}")
            deadline_s = max(floor_s, remaining_s())
            try:
                proc.wait(timeout=deadline_s)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                skipped[name] = (
                    f"timed out ({deadline_s:.0f}s deadline at collect, "
                    "launched right after the timing windows)"
                )
                logging.warning("%s timed out", name)
                return None
            out_f.seek(0)
            out = out_f.read()
            if proc.returncode != 0:
                err_f.seek(0)
                raise RuntimeError(
                    f"rc={proc.returncode}: {err_f.read().strip()[-300:]}"
                )
            return json.loads(out.strip().splitlines()[-1])
        except Exception as exc:
            logging.warning("%s failed: %s", name, exc)
            return None
        finally:
            out_f.close()
            err_f.close()

    warm_probe_aux = collect(warm_proc, "warm_probe", 30)
    if warm_probe_aux:
        warm_gen_s = warm_probe_aux.get("hypernet_gen_first_call_s")
    parsed = collect(train_proc, "train_step", 60)
    if parsed:
        try:
            train_aux = {
                "samples_per_sec_median": parsed["samples_per_sec_median"],
                "ms_per_update_median": parsed["ms_per_update_median"],
                "effective_batch": parsed["effective_batch"],
                "batch": parsed["batch"],
                "grad_accumulation_steps": parsed[
                    "grad_accumulation_steps"
                ],
                "fast_preset": parsed["fast_preset"],
                "frozen_kernel": parsed["frozen_kernel"],
                "loss": parsed["loss"],
                # methodology marker: the subprocess ran CONCURRENTLY with
                # the in-process sections (its compile/stall overlaps
                # them; its ~7 updates of chip work may see contention) —
                # compare with serial builder-session numbers accordingly
                "concurrent_with_sections": True,
            }
        except KeyError as exc:
            # schema drift in scripts.bench_train must not cost the
            # whole artifact (every section failure is recoverable)
            logging.warning("train_step output missing key: %s", exc)

    from hypervla_tpu.models.encoders.pretrained import (
        pretrained_unavailable_reason,
        weights_mode,
    )

    actions_per_sec = 1.0 / p50
    result = {
        "metric": "closed-loop actions/sec/chip p50 (generated base-net "
        "step, DINOv2-base bf16 + vit 4L/64d + mix head, bs=1)",
        "value": round(actions_per_sec, 2),
        "unit": "actions/s",
        "vs_baseline": round(actions_per_sec / 1000.0, 4),
        # the reference publishes no throughput number (BASELINE.md);
        # vs_baseline is the ratio to the driver's 1 kHz/chip north-star
        # target, and the headline regime is p50 over the timing windows
        # (r1 reported best-of; r2+ report p50 — see PERF.md trend table)
        "baseline_note": "vs_baseline = value / 1000 actions/s north-star "
        "target (no reference measurement exists); regime: p50",
        "weights": weights_mode("dinov2"),
        # VERDICT r3 item 2: if weights are random, the artifact must carry
        # the exact evidence of why (searched dirs + live egress probe)
        "weights_note": pretrained_unavailable_reason("dinov2-base") or None,
        "trunk": {
            "scan": "scan_stacked", "unroll": "unroll_stacked",
            "pallas": "pallas_kernel", "off": "xla",
        }[trunk_impl] if trunk_kernel else "xla",
        "packed_args": bool(trunk_kernel and pack_args),
        "aux": {
            "per_step_ms_p50": round(1000.0 * p50, 3),
            "per_step_ms_p90": round(1000.0 * p90, 3),
            "actions_per_sec_p90": round(1.0 / p90, 2),
            "actions_per_sec_best": round(1.0 / best, 2),
            "per_step_ms_best": round(1000.0 * best, 3),
            "device_ms_per_step": (
                round(device_ms, 3) if device_ms is not None else None
            ),
            "device_actions_per_sec": (
                round(1000.0 / device_ms, 1) if device_ms else None
            ),
            "hypernet_gen_first_call_s": round(gen_time_first, 3),
            "hypernet_gen_phases_s": {
                "model_build": round(build_s, 3),
                "create_tasks": round(create_tasks_s, 3),
                "prepare_serving_params": round(prepare_s, 3),
            },
            # trunk-kernel build/compile/first-exec/burn-in attribution
            # (VERDICT r4 item 2a: this region was a ~420 s unaccounted
            # hole in the r4 artifact)
            "serving_setup_phases_s": {
                k: v for k, v in setup_phases.items()
                if not k.startswith("_t0_")
            },
            "hypernet_gen_warm_process_s": warm_gen_s,
            "warm_probe": warm_probe_aux,
            "tunnel": tunnel_aux,
            "skipped_sections": skipped or None,
            "window_ms": [round(1000.0 * w, 3) for w in window_s],
            "train_samples_per_sec": (
                train_aux["samples_per_sec_median"] if train_aux else None
            ),
            "train_step": train_aux,
            "batch8_actions_per_sec": (
                round(batch8_actions_per_sec, 1)
                if batch8_actions_per_sec else None
            ),
            "multitask8_actions_per_sec": (
                round(multitask8_actions_per_sec, 1)
                if multitask8_actions_per_sec else None
            ),
            "scan8_actions_per_sec": (
                round(scan8_actions_per_sec, 1)
                if scan8_actions_per_sec else None
            ),
            "device": str(jax.devices()[0]),
        },
    }
    with emit_lock:
        done_event.set()  # the watchdog must not also emit
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
