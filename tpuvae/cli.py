"""Command-line interface — replaces the reference's "run the five scripts
top to bottom" workflow (``README.md:56-87``) with subcommands:

  python -m tpuvae.cli synth-data   --root=Datasets [--clips_per_genre_lang=4] [--container=wav|flac|mixed]
  python -m tpuvae.cli preprocess            [--key=value ...]
  python -m tpuvae.cli preprocess-advanced   [--key=value ...]
  python -m tpuvae.cli train-simple          [--key=value ...]
  python -m tpuvae.cli train-cvae            [--key=value ...]
  python -m tpuvae.cli train-hybrid          [--key=value ...]
  python -m tpuvae.cli all                   # full end-to-end sweep
  python -m tpuvae.cli encode --arch=hybrid song.wav [song2.wav ...]
  python -m tpuvae.cli serve  --arch=hybrid --port=8787   # HTTP daemon
  python -m tpuvae.cli eda                   # exploratory-analysis report
  python -m tpuvae.cli parity                # run sweep twice, diff metrics
  python -m tpuvae.cli quality               # assert planted-structure recovery
  python -m tpuvae.cli report                # print consolidated CSV

``serve`` keeps a trained model resident behind a JSON HTTP API
(``GET /healthz``, ``GET /info``, ``POST /encode`` — see
:mod:`tpuvae.serve`).  Flags: ``--arch``, ``--results_dir``, ``--data_dir``,
``--host`` (default 127.0.0.1), ``--port`` (default 8787),
``--warmup=0|1`` (pre-compile with one silent clip, default 1),
``--batch_wait_ms`` (>0 micro-batches concurrent requests into shared
device passes, default 0 = serialized), ``--max_batch`` (device rows per
pass under micro-batching, default 32).

``encode`` maps NEW audio clips through a trained model to latents +
nearest-training-centroid cluster ids (serving bundle from a prior
``train-*`` run).  Flags: ``--arch=simple|cvae|hybrid``, ``--results_dir``,
``--data_dir`` (preprocessing dir with the scalers), ``--lyrics=<text>``
(applied to every clip) or ``--lyrics_file=<path>`` (one line per clip),
``--genres=g1,g2,…`` (cvae condition), ``--out=<file.npz>`` to save
latents/clusters, ``--mesh=1`` to shard each device batch over all visible
chips (bulk offline scoring).

Global flags: ``--debug-nans`` enables jax debug-NaN checking for the run.

``--key=value`` overrides map onto the stage's config dataclass; values are
parsed as JSON first (so ``--epochs=5`` is an int).  Extra shared flags:
``--data_dir=…``, ``--results_dir=…``.
"""

from __future__ import annotations

import sys

from tpuvae.config import (
    AdvancedPreprocessConfig,
    ConditionalVAEConfig,
    HybridVAEConfig,
    PreprocessConfig,
    SimpleVAEConfig,
)


def _split_args(args, known: set[str]):
    cfg_args, extras = [], {}
    for a in args:
        key, sep, value = a.lstrip("-").partition("=")
        if key in known:
            extras[key] = value if sep else "1"   # bare flag => truthy
        else:
            cfg_args.append(a)
    return cfg_args, extras


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--debug-nans" in argv:
        argv.remove("--debug-nans")
        import jax

        jax.config.update("jax_debug_nans", True)
    if "--profile" in argv:
        argv.remove("--profile")
        import os

        os.environ["TPUVAE_PROFILE_DIR"] = os.environ.get(
            "TPUVAE_PROFILE_DIR", "profiles"
        )
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    from tpuvae.utils.cache import enable_compilation_cache

    enable_compilation_cache()   # reuse XLA executables across processes
    try:
        return _dispatch(argv)
    except KeyError as e:
        print(f"error: {e.args[0]}", file=sys.stderr)
        return 2
    except FileNotFoundError as e:
        print(f"error: missing input: {e}", file=sys.stderr)
        return 2
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


def _dispatch(argv) -> int:
    cmd, *rest = argv
    shared = {"data_dir", "data1_dir", "data2_dir", "results_dir", "root",
              "clips_per_genre_lang", "seed_data", "out_dir", "tol", "fast",
              "container", "separation"}
    cfg_args, extras = _split_args(rest, shared)

    if cmd == "synth-data":
        from tpuvae.io import generate_dataset

        meta = generate_dataset(
            extras.get("root", "Datasets"),
            clips_per_genre_lang=int(extras.get("clips_per_genre_lang", 4)),
            container=extras.get("container", "wav"),
            seed=int(extras.get("seed_data", 42)),
            separation=float(extras.get("separation", 1.0)),
        )
        print(f"synthetic dataset written; metadata: {meta}")
        return 0

    if cmd == "preprocess":
        from tpuvae.pipelines import preprocess_basic

        cfg = PreprocessConfig().override(cfg_args)
        preprocess_basic(cfg)
        return 0

    if cmd == "preprocess-advanced":
        from tpuvae.pipelines import preprocess_advanced

        cfg = AdvancedPreprocessConfig().override(cfg_args)
        preprocess_advanced(cfg)
        return 0

    if cmd in ("train-simple", "train-cvae", "train-hybrid", "all"):
        from pathlib import Path
        # --data_dir applies to the single pipeline being trained;
        # use --data1_dir/--data2_dir to direct them separately (e.g. 'all')
        data1 = extras.get("data1_dir") or extras.get("data_dir", "processed_data1")
        data2 = extras.get("data2_dir") or (
            extras.get("data_dir", "processed_data2")
            if cmd != "all" else "processed_data2"
        )
        if cmd == "all" and "data_dir" in extras and "data1_dir" not in extras:
            data1 = "processed_data1"   # never alias both to one dir in 'all'
        results = extras.get("results_dir", "results")
        def build_cfg(cfg_cls):
            """For 'all': apply each override to every config that has the
            field (unknown keys are validated upfront below)."""
            if cmd != "all":
                return cfg_cls().override(cfg_args)
            base = cfg_cls()
            mine = [a for a in cfg_args
                    if a.lstrip("-").split("=", 1)[0] in base.to_dict()]
            return base.override(mine)

        if cmd == "all" and cfg_args:
            known: set = set()
            for cls in (SimpleVAEConfig, ConditionalVAEConfig, HybridVAEConfig,
                        PreprocessConfig, AdvancedPreprocessConfig):
                known |= set(cls().to_dict())
            unknown = sorted(
                {a.lstrip("-").split("=", 1)[0] for a in cfg_args} - known
            )
            if unknown:
                raise KeyError(f"no stage config has field(s) {unknown}")

        if cmd == "all":
            # true end-to-end: chain synth-data → preprocess →
            # preprocess-advanced when their outputs are absent (the
            # reference's 5-script workflow, README.md:56-87); existing
            # artifact dirs are reused untouched.
            pre_cfg = build_cfg(PreprocessConfig)
            adv_cfg = build_cfg(AdvancedPreprocessConfig)
            pre_cfg = type(pre_cfg)(**{**pre_cfg.to_dict(), "output_dir": data1})
            adv_cfg = type(adv_cfg)(**{**adv_cfg.to_dict(), "output_dir": data2})
            need_pre = not Path(data1, "features_normalized.npy").exists()
            need_adv = not Path(data2, "mel_spectrograms_normalized.npy").exists()
            if (need_pre or need_adv) and not Path(pre_cfg.dataset_root).exists():
                from tpuvae.io import generate_dataset

                print(f"no dataset at {pre_cfg.dataset_root}; generating "
                      f"synthetic clips")
                # honor the generator flags (they ride in `extras`, so the
                # unknown-field validation above can't reject them — without
                # this they were silently dropped, the same bug class the
                # round-5 quality command fixed)
                generate_dataset(
                    pre_cfg.dataset_root,
                    seed=int(extras.get("seed_data", 42)),
                    separation=float(extras.get("separation", 1.0)),
                )
            if need_pre:
                from tpuvae.pipelines import preprocess_basic

                print(f"preprocess → {data1}")
                preprocess_basic(pre_cfg)
            if need_adv:
                from tpuvae.pipelines import preprocess_advanced

                print(f"preprocess-advanced → {data2}")
                preprocess_advanced(adv_cfg)

        if cmd in ("train-simple", "all"):
            from tpuvae.pipelines import run_simple_vae

            df = run_simple_vae(data1, results, build_cfg(SimpleVAEConfig))
            print(df.to_string(index=False))
        if cmd in ("train-cvae", "all"):
            from tpuvae.pipelines import run_conditional_vae

            df = run_conditional_vae(data2, results,
                                     build_cfg(ConditionalVAEConfig))
            print(df.to_string(index=False))
        if cmd in ("train-hybrid", "all"):
            from tpuvae.pipelines import run_hybrid_vae

            df = run_hybrid_vae(data2, results, build_cfg(HybridVAEConfig))
            print(df.to_string(index=False))
        return 0

    if cmd == "encode":
        from pathlib import Path

        import numpy as np

        from tpuvae.infer import ClipEncoder

        opts = {"arch", "results_dir", "data_dir", "lyrics", "lyrics_file",
                "genres", "out", "batch_size", "mesh"}
        paths, eopts = [], {}
        flags_done = False
        for a in rest:
            if a == "--":               # conventional end-of-flags marker
                flags_done = True
            elif not flags_done and a.startswith("-"):
                key, sep, value = a.lstrip("-").partition("=")
                if key not in opts:
                    raise KeyError(f"encode has no flag {key!r} "
                                   f"(known: {sorted(opts)})")
                if not sep:
                    raise ValueError(f"--{key} needs a value: --{key}=...")
                eopts[key] = value
            else:
                paths.append(a)
        if not paths:
            raise ValueError("encode needs at least one audio file")
        enc = ClipEncoder.load(
            eopts.get("arch", "hybrid"),
            results_dir=eopts.get("results_dir", "results"),
            data_dir=eopts.get("data_dir"),
        )
        lyrics = None
        if "lyrics_file" in eopts:
            lyrics = Path(eopts["lyrics_file"]).read_text().splitlines()
        elif "lyrics" in eopts:
            lyrics = [eopts["lyrics"]] * len(paths)
        genres = eopts["genres"].split(",") if "genres" in eopts else None
        mesh = None
        if eopts.get("mesh", "0") != "0":
            from tpuvae.parallel import MeshContext

            mesh = MeshContext.create()   # all visible devices, data axis
        res = enc.encode_paths(
            paths, lyrics=lyrics, genres=genres,
            batch_size=int(eopts.get("batch_size", 32)), mesh=mesh,
        )
        for p, c in zip(res.paths, res.clusters):
            print(f"{p}\tcluster={int(c)}")
        if "out" in eopts:
            np.savez(eopts["out"], latents=res.latents,
                     clusters=res.clusters, paths=np.asarray(res.paths))
            print(f"latents saved to {eopts['out']}")
        return 0

    if cmd == "serve":
        from tpuvae.serve import serve

        opts = {"arch", "results_dir", "data_dir", "host", "port", "warmup",
                "batch_wait_ms", "max_batch"}
        sopts = {}
        for a in rest:
            key, sep, value = a.lstrip("-").partition("=")
            if key not in opts:
                raise KeyError(f"serve has no flag {key!r} "
                               f"(known: {sorted(opts)})")
            if not sep:
                raise ValueError(f"--{key} needs a value: --{key}=...")
            sopts[key] = value
        serve(
            arch=sopts.get("arch", "hybrid"),
            results_dir=sopts.get("results_dir", "results"),
            data_dir=sopts.get("data_dir"),
            host=sopts.get("host", "127.0.0.1"),
            port=int(sopts.get("port", 8787)),
            warmup=sopts.get("warmup", "1") != "0",
            batch_wait_ms=float(sopts.get("batch_wait_ms", 0.0)),
            max_batch=int(sopts.get("max_batch", 32)),
        )
        return 0

    if cmd == "eda":
        import json

        from tpuvae.viz.eda import run_eda

        summary = run_eda(
            extras.get("data_dir", "processed_data2"),
            extras.get("out_dir", "results/EDA"),
        )
        print(json.dumps(summary, indent=2))
        return 0

    if cmd == "parity":
        from tpuvae.parity import run_parity

        res = run_parity(
            data1=extras.get("data1_dir", "processed_data1"),
            data2=extras.get("data2_dir", "processed_data2"),
            work_dir=extras.get("out_dir", "parity_runs"),
            tol=float(extras.get("tol", 0.01)),
            fast=extras.get("fast", "1") != "0",
        )
        if res["ok"]:
            print("PARITY OK: metrics reproduce within tolerance")
            return 0
        print("PARITY FAILED:")
        for p in res["problems"]:
            print("  -", p)
        return 1

    if cmd == "quality":
        import json

        from tpuvae.parity import QUALITY_FLOORS, quality_floors, run_quality

        # --separation picks the floor profile the corpus was synthesized
        # with (two-corpus calibration, parity.py); per-key overrides win.
        # Floor keys are quality-only, so they ride in cfg_args — re-split
        # (previously they were silently dropped: latent bug, round 5)
        floors = quality_floors(float(extras.get("separation", 1.0)))
        _, floor_args = _split_args(cfg_args, set(QUALITY_FLOORS))
        floors.update({k: float(v) for k, v in floor_args.items()})
        res = run_quality(
            data1=extras.get("data1_dir", "processed_data1"),
            data2=extras.get("data2_dir", "processed_data2"),
            results_dir=extras.get("out_dir", "quality_run"),
            floors=floors,
            fast=extras.get("fast", "1") != "0",
        )
        print(json.dumps(res["values"]))
        if res["ok"]:
            print("QUALITY OK: pipeline recovers the planted structure")
            return 0
        print("QUALITY FAILED:")
        for p in res["problems"]:
            print("  -", p)
        return 1

    if cmd == "report":
        import pandas as pd

        path = f"{extras.get('results_dir', 'results')}/clustering_metrics.csv"
        try:
            print(pd.read_csv(path).to_string(index=False))
        except FileNotFoundError:
            print(f"no results at {path}")
            return 1
        return 0

    print(f"unknown command: {cmd}\n")
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
