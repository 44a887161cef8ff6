"""Multi-host (DCN) plumbing smoke tests.

The reference is single-process (SURVEY.md §2); ``--distributed`` is the
TPU-native multi-host entry (`cli.py`): `jax.distributed.initialize()` from
JAX's standard env vars, then the same mesh/sharding code spans all hosts'
devices. No real second host exists in CI, so this runs the documented
recipe with two LOCAL processes on the CPU backend — coordinator handshake,
global device view, one cross-process psum through the framework's own mesh.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env(extra: dict) -> dict:
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "JAX_", "XLA_"))
    }
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra)
    return env


WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.distributed.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=int(os.environ["PID"]),
    )
    assert jax.device_count() == 2, jax.device_count()
    assert jax.local_device_count() == 1

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from diffmm_tpu.parallel import DATA_AXIS, make_mesh

    mesh = make_mesh(2, model_parallel=1)
    pid = int(os.environ["PID"])
    # one shard per process: global (2, 4) array from process-local rows
    local = np.full((1, 4), float(pid + 1), dtype=np.float32)
    arr = jax.make_array_from_single_device_arrays(
        (2, 4),
        NamedSharding(mesh, P(DATA_AXIS, None)),
        [jax.device_put(local, jax.local_devices()[0])],
    )
    total = jax.jit(lambda x: jnp.sum(x))(arr)
    # sum = 1*4 + 2*4 = 12 on every process
    assert float(total) == 12.0, float(total)
    print(f"proc {pid} ok", flush=True)
    """
)


def test_two_process_psum_over_mesh(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = []
    for pid in range(2):
        env = _clean_env(
            {
                "COORD": coord,
                "PID": str(pid),
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            }
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out


@pytest.mark.slow
def test_cli_distributed_flag_single_process(tmp_path):
    """`--distributed` end-to-end through the CLI: a 1-process 'cluster'
    (coordinator + worker in the same process) over the synthetic dataset."""
    port = _free_port()
    env = _clean_env(
        {
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "1",
            "JAX_PROCESS_ID": "0",
            "DIFFMM_DATASET": "synthetic:64x48",
        }
    )
    conf = tmp_path / "dist.toml"
    conf.write_text(
        "[base]\nlatdim = 16\ndenoise_dim = \"[32]\"\n"
        "[data]\nname = \"synthetic:64x48\"\n"
        "[train]\nbatch = 16\ntest_batch = 16\nepoch = 1\n"
    )
    proc = subprocess.run(
        [sys.executable, "-m", "diffmm_tpu", "--distributed",
         "-c", str(conf), "--epochs", "1"],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
