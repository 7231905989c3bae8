"""Multi-host (DCN) data-parallel dry run + parity certificate.

docs/SCALING.md's topology claim — "keep dp shardings on ICI; only dataset
loading crosses DCN" — is exercised here as an EXECUTED path, not prose: a
``jax.distributed`` multi-controller run (N processes x M virtual CPU
devices each, coordinator over localhost gRPC standing in for DCN) jits the
full TRX-OS episodic training step over the global mesh and certifies the
result equals the single-device step. Each process materializes only its
own devices' batch shards from the host copy (parallel/mesh.py::put_global),
so the only cross-process traffic during the step is XLA's gradient
all-reduce — exactly the production multi-host topology, shrunk onto one
box.

Beyond-reference: the reference's only parallelism is single-host
``torch.nn.DataParallel`` (modules/ar/utils/model.py:360-369); its
``torch.distributed`` surface is vestigial vendored helpers that are never
initialized (SURVEY §2.6).

Entry points:

- ``multihost_dp_parity(num_processes, local_devices)`` — launcher: spawns
  the worker subprocesses, waits, returns process 0's report dict.
- ``python -m isbfsar_tpu.parallel.multihost --process-id i ...`` — one
  worker (used by the launcher; runnable by hand for debugging).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
from typing import Dict


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker_main(process_id: int, num_processes: int, coordinator: str,
                local_devices: int, out_path: str) -> Dict[str, float]:
    """Run ONE dp training step over the global multi-process mesh and
    compare against the 1-device baseline computed locally.

    Must run in a fresh process: the CPU device count and platform have to
    be fixed before any JAX backend initializes (the launcher guarantees
    this by exporting the env in the subprocess).
    """
    import jax

    # this box's sitecustomize force-registers the TPU relay backend and
    # overrides JAX_PLATFORMS, so pin the platform via config before the
    # backend initializes (same workaround as __graft_entry__.dryrun_multichip)
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", local_devices)
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    n_global = num_processes * local_devices
    assert len(jax.devices()) == n_global, (
        f"expected {n_global} global devices, got {len(jax.devices())}"
    )

    import dataclasses

    import numpy as np

    from isbfsar_tpu.configs import ARConfig
    from isbfsar_tpu.parallel.mesh import make_mesh
    from isbfsar_tpu.train.synthetic import episodic_batch
    from isbfsar_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(
        ARConfig.for_input("skeleton"),
        batch_size=n_global,
        n_task=n_global,
        eval_every_n_epoch=10_000,
    )
    # Every process builds the identical host batch (seed-deterministic) and
    # contributes only its own devices' shards (put_global) — the dryrun
    # analog of per-host dataset loading.
    batch = episodic_batch(cfg, n_global, rgb_size=32, modality="skeleton",
                           seed=0)

    def one_step(mesh, tag):
        trainer = Trainer(
            cfg, mesh=mesh, log_dir=tempfile.mkdtemp(prefix=f"mh_{tag}_"),
            use_wandb=False, seed=0,
        )
        placed = trainer._prepare(batch)
        # run_epoch's metric aggregation pulls dp-sharded per-sample arrays
        # to host, which a multi-controller process cannot do for
        # non-addressable shards — drive the jitted step directly and read
        # back only the replicated trees.
        params, stats, _, metrics = trainer._train_step(
            trainer.params, trainer.batch_stats, trainer.opt_state, placed,
            False,
        )
        return placed, params, metrics

    global_mesh = make_mesh(n_global)
    placed, params_n, metrics_n = one_step(global_mesh, "global")

    # 1-device baseline mesh must use a LOCAL device: global device 0 is
    # not addressable from process 1, and make_mesh slices jax.devices().
    from jax.sharding import Mesh

    local_mesh = Mesh(np.asarray(jax.local_devices()[:1]), ("dp",))

    # Non-vacuity: the certified step's batch really spanned both processes
    # (each leaf holds only local_devices of n_global shards here).
    leaf = jax.tree.leaves(placed)[0]
    n_procs_in_batch = len(
        {d.process_index for d in leaf.sharding.device_set}
    )
    addressable = len(leaf.addressable_shards)
    assert n_procs_in_batch == num_processes, (
        f"batch sharding spans {n_procs_in_batch} processes, "
        f"expected {num_processes}"
    )
    assert addressable == local_devices, (
        f"process {process_id} holds {addressable} shards, "
        f"expected {local_devices}"
    )

    _, params_1, metrics_1 = one_step(local_mesh, "local")

    # Params are replicated -> every process can read them whole.
    def to_host(tree):
        return jax.tree.map(np.asarray, tree)

    p1, pn = to_host(params_1), to_host(params_n)
    diffs = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p1, pn)
    )
    report = {
        "max_param_diff": max(diffs) if diffs else 0.0,
        "max_metric_diff": max(
            abs(float(metrics_1[k]) - float(metrics_n[k]))
            for k in ("fs_loss",)
        ),
        "num_processes": num_processes,
        "global_devices": n_global,
        "batch_processes_spanned": n_procs_in_batch,
        "local_shards": addressable,
    }
    atol = 2e-6
    assert report["max_param_diff"] <= atol, (
        f"multi-host dp parity violated: {report}"
    )
    assert report["max_metric_diff"] <= atol, (
        f"multi-host dp parity violated: {report}"
    )
    if process_id == 0 and out_path:
        with open(out_path, "w") as f:
            json.dump(report, f)
    return report


def multihost_dp_parity(num_processes: int = 2, local_devices: int = 4,
                        timeout: float = 900.0) -> Dict[str, float]:
    """Launch the multi-controller dp-parity dry run and return the report.

    Spawns ``num_processes`` fresh Python workers, each pinned to the CPU
    platform with ``local_devices`` virtual devices, joined through a
    localhost ``jax.distributed`` coordinator (the DCN stand-in)."""
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out_path = tempfile.mktemp(prefix="multihost_report_", suffix=".json")
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_NUM_CPU_DEVICES=str(local_devices),
            PYTHONPATH=repo_root + os.pathsep + env.get("PYTHONPATH", ""),
        )
        # this box's sitecustomize force-registers the TPU relay backend;
        # neutralize it for the CPU-only workers
        env.pop("JAX_PLATFORM_NAME", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "isbfsar_tpu.parallel.multihost",
             "--process-id", str(pid),
             "--num-processes", str(num_processes),
             "--coordinator", coordinator,
             "--local-devices", str(local_devices),
             "--out", out_path],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outputs):
        if p.returncode != 0:
            raise RuntimeError(
                f"multihost worker failed (rc={p.returncode}):\n{out[-4000:]}"
            )
    with open(out_path) as f:
        report = json.load(f)
    os.unlink(out_path)
    return report


def _main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, required=True)
    ap.add_argument("--out", default="")
    a = ap.parse_args()
    report = worker_main(a.process_id, a.num_processes, a.coordinator,
                         a.local_devices, a.out)
    print(f"[multihost worker {a.process_id}] {report}")


if __name__ == "__main__":
    _main()
