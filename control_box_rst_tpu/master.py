"""Experiment master: CLI entry point.

Ref parity: `corbo-master` (ref: src/master/src/app.cpp:55, master.h:64) —
the reference runs a gRPC service that receives protobuf component configs
and streams signals to the GUI. The TPU build replaces that control plane
with a YAML config file + this CLI (SURVEY.md §2.7: gRPC kept only at the
experiment-config boundary; here YAML serves that role), exporting recorded
signals to YAML/TSV like the reference's data exporters.

Usage:
    python -m control_box_rst_tpu.master --config experiment.yaml \
        [--out results_dir] [--format tsv|yaml]
    python -m control_box_rst_tpu.master --serve localhost:50051 \
        [--config experiment.yaml]        # gRPC server mode (ref: app.cpp -s)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="control_box_rst_tpu experiment master")
    p.add_argument("--config", "-m", default=None, help="YAML experiment config")
    p.add_argument(
        "--serve", "-s", nargs="?", const="localhost:50051", default=None,
        metavar="ADDR",
        help="run as a gRPC master service on ADDR (ref: corbo-master -s); "
        "--config preloads the experiment",
    )
    p.add_argument("--out", "-o", default=None, help="output directory")
    p.add_argument("--format", choices=("tsv", "yaml", "both"), default="tsv")
    p.add_argument("--print-signals", action="store_true")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu, tpu)")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from control_box_rst_tpu.core.config import load_config, run_experiment
    from control_box_rst_tpu.core.export import export_tsv, export_yaml

    if args.serve is not None:
        from concurrent import futures

        import grpc

        from control_box_rst_tpu.comm.server import MasterServer

        master = MasterServer()
        if args.config:
            with open(args.config) as f:
                master.set_section("config", f.read())
        server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
        server.add_generic_rpc_handlers((master.grpc_handler(),))
        server.add_insecure_port(args.serve)
        server.start()
        print(f"corbo_tpu master listening on {args.serve}")
        server.wait_for_termination()
        return 0

    if not args.config:
        p.error("--config is required unless --serve is given")
    config = load_config(args.config)
    t0 = time.perf_counter()
    rec = run_experiment(config)
    wall = time.perf_counter() - t0
    print(f"experiment finished in {wall:.2f}s; signals: {sorted(rec.names())}")

    if args.print_signals:
        for name in sorted(rec.names()):
            sig = rec.get(name)
            import numpy as np

            vals = np.asarray(sig.get("values", sig.get("matrices", [])))
            print(f"  {name}: kind={sig['kind']} shape={vals.shape}")

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        if args.format in ("tsv", "both"):
            export_tsv(rec, os.path.join(args.out, "signals"))
        if args.format in ("yaml", "both"):
            export_yaml(rec, os.path.join(args.out, "signals.yaml"))
        with open(os.path.join(args.out, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
        print(f"results written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
