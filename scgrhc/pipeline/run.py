"""Pipeline orchestrator (reference parity: waveform_pipeline.py).

``run(params)`` executes the full experiment: dataset build → train →
evaluate every checkpoint on the valid split → select best checkpoint →
final evaluation on the test split.  Stage order, exception-swallowing on
re-runnable stages, and the best-checkpoint file handshake match the
reference (waveform_pipeline.py:10-28).
"""

from __future__ import annotations

import os

from scgrhc.core.params import Params


def run(params: Params) -> None:
    from scgrhc.data import run as data_run
    from scgrhc.eval import run as eval_run
    from scgrhc.select import run as select_run
    from scgrhc.train import run as train_run

    try:
        data_run.run(params)
    except Exception as e:  # stage is idempotent; reruns skip (ref :12-15)
        print(e)

    train_run.run(params)

    try:
        eval_run.run(params, "valid", "all")
    except Exception as e:  # ref :19-22
        print(e)

    select_run.run(params)

    with open(os.path.join(params.dir_path, "checkpoint_best.txt"), "r") as f:
        best_checkpoint = f.read().splitlines()[0].split()[1]
        eval_run.run(params, "test", best_checkpoint)


def dispatch(argv: list[str]) -> int:
    """CLI dispatch for ``python -m scgrhc`` (see __main__)."""
    cmd = argv[0]
    if cmd == "summary":
        from scgrhc.summary import main as summary_main

        summary_main()
        return 0
    if cmd == "sweep":
        # scgrhc sweep <root> [--jobs N] [--epochs E] [--fast] — generate the
        # 32-config waveform_06..37 matrix under <root> (if absent) and run
        # every experiment, experiment-parallel across processes.
        from scgrhc.pipeline.sweep import run_sweep
        from scgrhc.utils.experiments import write_experiments

        root = argv[1] if len(argv) > 1 and not argv[1].startswith("--") else "."
        # train_mode "step" (sweep-only default): the per-batch jitted
        # step compiles once per (batch, channels) shape — 8 programs
        # across all 32 configs — where the epoch-scan program bakes in
        # each config's segment count, so nearly every config pays its
        # own multi-minute remote compile (round-2 BENCH: 3h46m cold).
        # Artifact-identical to epoch mode (test_step_and_epoch_modes);
        # production 250-epoch runs should keep epoch mode (faster steady
        # state, compile amortized) via --train-mode epoch.
        jobs, overrides = 1, {"train_mode": "step"}
        inproc = None
        prune = False
        rest = argv[2:] if root != "." or (len(argv) > 1 and argv[1] == ".") else argv[1:]
        i = 0
        while i < len(rest):
            if rest[i] == "--jobs":
                jobs = int(rest[i + 1]); i += 2
            elif rest[i] == "--epochs":
                overrides["total_epochs"] = int(rest[i + 1]); i += 2
            elif rest[i] == "--seed":
                overrides["seed"] = int(rest[i + 1]); i += 2
            elif rest[i] == "--train-mode":
                overrides["train_mode"] = rest[i + 1]; i += 2
            elif rest[i] == "--prune":
                # reclaim each finished config's non-essential checkpoints
                # (keeps first/best/last; see sweep.prune_checkpoints)
                prune = True; i += 1
            elif rest[i] == "--inproc":
                inproc = True; i += 1
            elif rest[i] == "--subproc":
                inproc = False; i += 1
            elif rest[i] == "--fast":
                # the measured-best TPU training bundle (core/params.py
                # train_profile "fast"; BENCH.md round 3) applied to every
                # generated config — incl. shape_bucket, which also
                # dedups the step-mode tail program
                overrides["train_profile"] = "fast"; i += 1
            else:
                raise SystemExit(f"unknown sweep flag {rest[i]}")
        if inproc is None:
            # --fast makes every same-batch config share one program
            # shape, so at jobs=1 the in-process runner reuses the
            # in-memory executable across configs (compile + remote
            # program reload paid once per batch-size class, not per
            # config).  --jobs N keeps process fan-out for multi-chip.
            inproc = jobs <= 1 and overrides.get("train_profile") == "fast"
        if inproc:
            # this process is the one compiling — configure the persistent
            # cache now.  The subproc path must NOT touch jax here: backend
            # resolution instantiates the device client, and a parent
            # holding the TPU starves every fanned-out child on
            # exclusive-access hosts (children configure their own cache
            # via their __main__).
            import scgrhc

            scgrhc.configure_compilation_cache()
        dirs = write_experiments(root, **overrides)
        results = run_sweep(dirs, jobs=jobs, inproc=inproc, prune=prune)
        return 0 if all(c == 0 for c in results.values()) else 1
    if cmd == "demo":
        from scgrhc.pipeline import demo

        workdir = argv[1] if len(argv) > 1 and not argv[1].startswith("--") else "scgrhc_demo"
        kw = {}
        rest = argv[2:] if workdir != "scgrhc_demo" or (len(argv) > 1 and argv[1] == "scgrhc_demo") else argv[1:]
        i = 0
        while i < len(rest):
            if rest[i] == "--epochs":
                kw["epochs"] = int(rest[i + 1]); i += 2
            elif rest[i] == "--records":
                kw["n_records"] = int(rest[i + 1]); i += 2
            elif rest[i] == "--seconds":
                kw["duration_s"] = float(rest[i + 1]); i += 2
            else:
                raise SystemExit(f"unknown demo flag {rest[i]}")
        demo.run(workdir, **kw)
        return 0
    if cmd == "plots":
        # scgrhc plots <dir> <split> <ckpt|best> [n]
        from scgrhc.pipeline import plots, predict

        params = Params(os.path.join(argv[1], "params.json"))
        ckpt = predict.resolve_checkpoint(params, argv[3])
        plots.run(params, argv[2], ckpt, n=int(argv[4]) if len(argv) > 4 else 5)
        return 0
    if cmd == "export":
        # scgrhc export <dir> <ckpt|best|last> [out_path] — re-encode a
        # checkpoint as a genuine torch.save file for the reference tools
        from scgrhc.pipeline import predict
        from scgrhc.train import checkpoint as ckpt_io
        from scgrhc.train import orbax_io

        params = Params(os.path.join(argv[1], "params.json"))
        name = predict.resolve_checkpoint(params, argv[2])
        src = os.path.join(params.checkpoint_dir_path, name)
        # default output OUTSIDE checkpoint_dir_path: a .torch file in the
        # checkpoint dir would shadow the real checkpoint in the reference's
        # reverse-lex resume sort and pad eval's 'all' enumeration
        out = argv[3] if len(argv) > 3 else os.path.join(
            params.dir_path, name.replace(orbax_io.ORBAX_SUFFIX, "") + ".torch"
        )
        if orbax_io.is_orbax_checkpoint(src):
            from scgrhc.train.wgan import TrainConfig

            ref = src[: -len(orbax_io.ORBAX_SUFFIX)] + ".tmp"
            orbax_io.to_reference(
                src, ref, TrainConfig.from_params(params), len(params.in_channels)
            )
            ckpt_io.export_torch(ref, out)
            os.remove(ref)
        else:
            ckpt_io.export_torch(src, out)
        print(f"Exported {src} -> {out}")
        return 0
    if cmd == "export-loaders":
        # scgrhc export-loaders <dir> [out_dir] — re-encode the experiment's
        # loader files as genuine pickled torch DataLoaders the reference
        # scripts load unchanged (reference: recordutil.py:202-224)
        from scgrhc.data.torch_export import export_torch_loaders

        params = Params(os.path.join(argv[1], "params.json"))
        out_dir = argv[2] if len(argv) > 2 else None
        for path in export_torch_loaders(params, out_dir):
            print(f"Exported {path}")
        return 0
    if cmd == "report":
        from scgrhc.pipeline import report

        report.run(argv[1] if len(argv) > 1 else ".")
        return 0
    if cmd == "predict":
        # scgrhc predict <dir> <record> [checkpoint=best] [--overlap S]
        from scgrhc.pipeline import predict

        dir_name, record_name = argv[1], argv[2]
        rest = argv[3:]
        which = rest[0] if rest and not rest[0].startswith("--") else "best"
        overlap = 0.0
        if "--overlap" in rest:
            overlap = float(rest[rest.index("--overlap") + 1])
        params = Params(os.path.join(dir_name, "params.json"))
        predict.run(
            params, record_name, checkpoint=which, overlap_s=overlap,
            continuous="--continuous" in rest,
            calibrate="--calibrate" in rest,
            mesh="--mesh" in rest,
        )
        return 0
    if cmd == "serve":
        # scgrhc serve <dir> [ckpt|best|last] [--calibrate] [--warm N] [--mesh]
        from scgrhc.pipeline import serve

        rest = argv[2:]
        which = rest[0] if rest and not rest[0].startswith("--") else "best"
        usage = ("usage: scgrhc serve <dir> [ckpt] "
                 "[--calibrate] [--warm N] [--mesh] [--timeout S]")
        warm = 0
        if "--warm" in rest:
            i = rest.index("--warm")
            try:
                warm = int(rest[i + 1])
            except (IndexError, ValueError):
                raise SystemExit(usage)
        timeout = None
        if "--timeout" in rest:
            i = rest.index("--timeout")
            try:
                timeout = float(rest[i + 1])
            except (IndexError, ValueError):
                raise SystemExit(usage)
        params = Params(os.path.join(argv[1], "params.json"))
        serve.run(
            params, checkpoint=which, calibrate="--calibrate" in rest,
            warm=warm, mesh="--mesh" in rest, timeout=timeout,
        )
        return 0
    if cmd in ("data", "train", "test", "select"):
        dir_name = argv[1]
        params = Params(os.path.join(dir_name, "params.json"))
        if cmd == "data":
            from scgrhc.data import run as data_run

            data_run.run(params)
        elif cmd == "train":
            from scgrhc.train import run as train_run

            train_run.run(params)
        elif cmd == "test":
            from scgrhc.eval import run as eval_run

            eval_run.run(params, argv[2], argv[3])
        elif cmd == "select":
            from scgrhc.select import run as select_run

            select_run.run(params)
        return 0
    # Default: full pipeline on one dir or the reference's `all` sweep
    # (waveform_06..33, reference: waveform_pipeline.py:33-37).
    if cmd == "all":
        for i in range(6, 34):
            dir_name = f"waveform_{i:02d}"
            run(Params(os.path.join(dir_name, "params.json")))
    else:
        run(Params(os.path.join(cmd, "params.json")))
    return 0
