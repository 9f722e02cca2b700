"""Multi-host groundwork smoke test: two real OS processes coordinate via
jax.distributed on the CPU backend, build a (dcn, data, spatial) mesh, and
run a global jitted computation over a batch sharded across hosts (gradient
psum analog rides the 'dcn' axis)."""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    from jpdse_tpu.platform import honor_jax_platforms_env
    honor_jax_platforms_env()  # the axon sitecustomize overrides JAX_PLATFORMS
    import jax
    from jpdse_tpu.parallel import distributed as D

    pid = int(sys.argv[1])
    multi = D.initialize("localhost:{port}", 2, pid)
    assert multi, "expected multi-process"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    mesh = D.make_dcn_mesh(n_data=2, n_spatial=1)
    assert mesh.shape == {{"dcn": 2, "data": 2, "spatial": 1}}

    import jax.numpy as jnp
    import numpy as np
    # each process contributes 2 rows; global batch is 4 rows
    local = np.full((2, 8), 1.0 + pid, np.float32)
    gbatch = D.make_global_batch({{"x": local}}, mesh, shard_spatial=False)

    @jax.jit
    def global_sum(x):
        return jnp.sum(x)

    total = float(global_sum(gbatch["x"]))
    # rows: 2x(1.0) + 2x(2.0), 8 cols -> 48
    assert abs(total - 48.0) < 1e-5, total
    print(f"proc {{pid}} ok: global sum {{total}}")
    """
)


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dcn_mesh(tmp_path):
    port = _free_port()  # fixed ports collide across parallel/retried runs
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO, port=port))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "ok: global sum" in out
