"""Multi-process mesh parity dryrun (SURVEY §5.8, VERDICT round-4 #5).

Launches scripts/multihost_worker.py as (a) ONE process with 8 virtual CPU
devices (baseline) and (b) TWO processes with 4 virtual CPU devices each,
joined by jax.distributed.initialize over a local coordinator with gloo
CPU collectives. Both run the identical compact DP x TP training step
(__graft_entry__._compact_setup) on the identical global batch; the loss
and the replicated-param checksum must agree at rtol 2e-5 — proving the
mesh/sharding/step stack does not silently assume process-local
addressable devices.

Usage: python scripts/multihost_dryrun.py [--timeout 600]
Prints "dryrun_multihost OK: ..." and exits 0 on parity.
"""

from __future__ import annotations

import argparse
import os
import re
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _parse(line_blob: str):
    m = re.search(
        r"MULTIHOST pid=0 procs=\d+ loss=([\d.eE+-]+) "
        r"repl_checksum=([\d.eE+-]+) scan_loss=([\d.eE+-]+)", line_blob)
    if not m:
        raise RuntimeError(f"worker output unparsable:\n{line_blob[-2000:]}")
    return float(m.group(1)), float(m.group(2)), float(m.group(3))


def run(timeout: float = 600.0) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # workers self-provision device counts
    if "JAX_COMPILATION_CACHE_DIR" not in env:
        # host-keyed, like conftest.py: XLA:CPU AOT entries embed LLVM
        # target features — an unkeyed shared dir risks loading a foreign
        # host's entries (SIGILL; see mmtpu/utils/compile_cache.py)
        sys.path.insert(0, ROOT)
        from mmtpu.utils.compile_cache import host_cache_dir

        env["JAX_COMPILATION_CACHE_DIR"] = host_cache_dir(ROOT)

    # -- single-process baseline: 1 x 8 devices -------------------------
    base = subprocess.run(
        [sys.executable, WORKER, "--num-processes", "1",
         "--local-devices", "8"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=timeout,
    )
    if base.returncode != 0:
        raise RuntimeError(f"baseline worker failed:\n{base.stderr[-2000:]}")
    loss_1p, ck_1p, scan_1p = _parse(base.stdout)

    # -- 2 processes x 4 devices over a distributed service -------------
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER,
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--local-devices", "4"],
            cwd=ROOT, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        if rc != 0:
            raise RuntimeError(f"multihost worker failed (rc={rc}):\n"
                               f"{err[-2000:]}")
    loss_2p, ck_2p, scan_2p = _parse(outs[0][1])

    rtol = 2e-5
    if abs(loss_2p - loss_1p) > rtol * max(1.0, abs(loss_1p)):
        raise AssertionError(
            f"multihost loss {loss_2p!r} != single-process {loss_1p!r}")
    if abs(ck_2p - ck_1p) > rtol * max(1.0, abs(ck_1p)):
        raise AssertionError(
            f"multihost replicated-param checksum {ck_2p!r} != "
            f"single-process {ck_1p!r}")
    if abs(scan_2p - scan_1p) > rtol * max(1.0, abs(scan_1p)):
        raise AssertionError(
            f"multihost scan-epoch loss {scan_2p!r} != "
            f"single-process {scan_1p!r}")
    msg = (f"dryrun_multihost OK: 2 procs x 4 devices == 1 proc x 8 devices "
           f"(loss {loss_2p:.6f} vs {loss_1p:.6f}, repl-param checksum "
           f"{ck_2p:.4f} vs {ck_1p:.4f}, scan-epoch loss {scan_2p:.6f} vs "
           f"{scan_1p:.6f}, rtol {rtol})")
    return msg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()
    print(run(timeout=args.timeout), flush=True)


if __name__ == "__main__":
    main()
