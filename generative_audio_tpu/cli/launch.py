"""Multi-process launcher — the reference's mp.spawn analogue.

Reference: tools/train.py:85-120 (parse args, pick GPUs, mp.spawn one
training process per device with a rendezvous port). The TPU-native shape:
on a real pod each host starts the SAME command (by the pod runtime /
gcloud), so no launcher is needed there. This launcher covers the other
case the reference's mp.spawn served — bringing up an N-process job on ONE
machine — by spawning N copies of the command on the CPU backend with the
GAT_* env contract that `parallel.distributed.initialize()` reads:

    python -m generative_audio_tpu.cli.launch --nprocs 2 \
        --devices-per-process 4 -- python -m generative_audio_tpu.cli.train ...

Each child sees `devices_per_process` virtual CPU devices; after
initialize(), jax.devices() is the global 8-device set and a make_mesh()
spans both processes — the multi-host code path, tested without a pod.
"""
from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

__all__ = ["main"]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Spawn an N-process jax.distributed job on this host")
    parser.add_argument("--nprocs", type=int, required=True)
    parser.add_argument("--devices-per-process", type=int, default=1,
                        help="virtual CPU devices per process (dev mode)")
    parser.add_argument("--port", type=int, default=None,
                        help="coordinator port (default: pick a free one)")
    parser.add_argument("--backend", default="cpu",
                        help='"cpu" (default, virtual devices) or "" to '
                             "inherit the environment's backend")
    parser.add_argument("command", nargs=argparse.REMAINDER,
                        help="command to run in each process (after --)")
    args = parser.parse_args(argv)

    command = args.command
    if command and command[0] == "--":
        command = command[1:]
    if not command:
        parser.error("no command given (append it after --)")

    port = args.port or _free_port()
    coordinator = f"127.0.0.1:{port}"

    # Spawn + wait inside one try/finally: if Popen fails mid-spawn (fd or
    # process limits), the already-started ranks would otherwise be leaked,
    # hung forever inside jax.distributed.initialize waiting for a world
    # that never assembles.
    import time as _time
    procs = []
    first_bad = 0
    try:
        for rank in range(args.nprocs):
            env = dict(os.environ)
            env["GAT_COORDINATOR"] = coordinator
            env["GAT_NUM_PROCESSES"] = str(args.nprocs)
            env["GAT_PROCESS_ID"] = str(rank)
            if args.backend:
                env["JAX_PLATFORMS"] = args.backend
                flags = [f for f in env.get("XLA_FLAGS", "").split() if f and
                         "xla_force_host_platform_device_count" not in f]
                flags.append("--xla_force_host_platform_device_count="
                             f"{args.devices_per_process}")
                env["XLA_FLAGS"] = " ".join(flags)
            procs.append(subprocess.Popen(command, env=env))

        # Wait for all ranks; on the first nonzero exit, terminate the rest
        # by handle (never by process-name pattern) so one crashed rank
        # doesn't leave the others hung on the dead coordinator.
        pending = list(procs)
        while pending:
            for p in list(pending):
                if p.poll() is not None:
                    pending.remove(p)
                    if p.returncode != 0 and first_bad == 0:
                        first_bad = p.returncode
                        for q in pending:
                            q.terminate()
            if pending:
                _time.sleep(0.2)
        # negative returncode = died on signal N; report shell-style 128+N
        rc = first_bad if first_bad >= 0 else 128 - first_bad
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            if p.poll() is None:
                try:
                    p.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    p.kill()
    return rc


if __name__ == "__main__":
    sys.exit(main())
