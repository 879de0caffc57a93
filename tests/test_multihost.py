"""Multi-host DP wiring tests (parallel/multihost.py).

The real thing (two coordinated processes, a global 2-device mesh, a
cross-process psum) runs in subprocesses on the CPU backend — the same
mechanism a multi-host TPU pod uses, minus ICI.  If this jaxlib build
lacks CPU cross-process collectives, the subprocess test skips with the
reported reason rather than failing.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from instancesegmentation_tpu.parallel import multihost

    port, pid = sys.argv[1], int(sys.argv[2])
    multihost.initialize(
        coordinator=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert jax.local_device_count() == 1

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from instancesegmentation_tpu.parallel.mesh import make_mesh
    from instancesegmentation_tpu.parallel.data_parallel import shard_map

    mesh = make_mesh(axis_names=("data",))
    sl = multihost.local_batch_slice(4)
    assert sl == slice(pid * 2, pid * 2 + 2), sl

    local = np.full((2, 3), float(pid + 1), np.float32)
    garr = multihost.global_array_from_local(local, mesh, P("data"))
    assert garr.shape == (4, 3)

    def f(x):
        return jax.lax.psum(jnp.sum(x), "data")

    total = shard_map(f, mesh, in_specs=(P("data"),), out_specs=P())(garr)
    # rows: 2*3 ones from proc0 + 2*3 twos from proc1 = 6 + 12
    np.testing.assert_allclose(np.asarray(total), 18.0)
    print(f"proc{pid} OK", flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=170)
        outs.append((p.returncode, out))

    joined = "\n".join(o for _, o in outs)
    if any(rc for rc, _ in outs):
        lowered = joined.lower()
        if "collective" in lowered or "not implemented" in lowered or (
            "unimplemented" in lowered
        ):
            pytest.skip(f"CPU cross-process collectives unavailable: {joined[-400:]}")
        raise AssertionError(f"multihost workers failed:\n{joined}")
    assert "proc0 OK" in joined and "proc1 OK" in joined


def test_local_batch_slice(monkeypatch):
    import jax

    from instancesegmentation_tpu.parallel import multihost

    assert multihost.process_info() == (jax.process_index(), jax.process_count())
    assert multihost.local_batch_slice(8) == slice(0, 8)

    monkeypatch.setattr(multihost, "process_info", lambda: (1, 4))
    assert multihost.local_batch_slice(8) == slice(2, 4)
    with pytest.raises(ValueError):
        multihost.local_batch_slice(7)
