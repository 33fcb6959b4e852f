"""Multi-host skeleton: 2-process jax.distributed smoke (SURVEY.md §5.8).

Counterpart of the reference's Ray cluster span (reference muzero.py:96
ray.init, README.md:23): training data-parallel over a global mesh that
crosses process boundaries, self-play per host. The smoke itself lives in
muzero_general_tpu/parallel/dist_smoke.py; this test launches it as two
real OS processes with 4 virtual CPU devices each and asserts both report
the identical post-psum loss.
"""

import os
import socket
import subprocess
import sys
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh_smoke():
    port = _free_port()
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=str(REPO),
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "muzero_general_tpu.parallel.dist_smoke",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(i),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
    ok = [line for out in outs for line in out.splitlines()
          if line.startswith("dist_smoke OK")]
    assert len(ok) == 2, outs
    # Both processes computed the identical replicated loss.
    loss0 = ok[0].split("loss=")[1].split(",")[0]
    loss1 = ok[1].split("loss=")[1].split(",")[0]
    assert loss0 == loss1, (loss0, loss1)
