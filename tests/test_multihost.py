"""Multi-host execution: the dist pipeline under a real 2-process
jax.distributed CPU launch (4 local devices per process, 8 global).

This is the single-machine simulation of a multi-host TPU slice: the
mesh spans both processes, shard_map collectives cross the process
boundary, and dist.py's host syncs go through process_allgather.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
import numpy as np
from debwt_tpu.parallel import dist_build_bwt, make_mesh
from debwt_tpu.types import PipelineConfig, SequenceCollection
rng = np.random.default_rng(5)
reads = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(60, 220))))
         for _ in range(9)]
coll = SequenceCollection.from_reads(reads)
res = dist_build_bwt(coll, PipelineConfig(), make_mesh())
if pid == 0:
    np.savez(out, bwt6=res.bwt6, sharp=res.sharp_pos,
             dollar=np.int64(res.dollar_pos))
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dist(tmp_path):
    port = _free_port()
    out = tmp_path / "r0.npz"
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    src = os.path.join(os.path.dirname(__file__), "..", "src")
    env = dict(os.environ)
    # strip the axon sitecustomize; force a 4-device CPU runtime
    env["PYTHONPATH"] = os.path.abspath(src)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            o, e = p.communicate(timeout=420)
            outs.append((p.returncode, o, e))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, o, e in outs:
        assert rc == 0, e.decode()[-3000:]

    # reproduce the worker's input and compare with golden
    from debwt_tpu.golden import golden_bwt
    from debwt_tpu.types import SequenceCollection

    rng = np.random.default_rng(5)
    reads = ["".join(rng.choice(list("ACGT"),
                                size=int(rng.integers(60, 220))))
             for _ in range(9)]
    coll = SequenceCollection.from_reads(reads)
    g = golden_bwt(coll)
    got = np.load(out)
    assert (got["bwt6"] == g.bwt6).all()
    assert (got["sharp"] == g.sharp_pos).all()
    assert int(got["dollar"]) == g.dollar_pos


CLI_WORKER = r"""
import sys
from debwt_tpu.cli import main
sys.exit(main(sys.argv[1:]))
"""


@pytest.mark.slow
def test_two_process_cli_dist(tmp_path):
    # fixed collection, written once, read by both processes
    rng = np.random.default_rng(13)
    reads = ["".join(rng.choice(list("ACGT"),
                                size=int(rng.integers(60, 200))))
             for _ in range(8)]
    fasta = tmp_path / "in.fa"
    fasta.write_text(
        "".join(f">r{i}\n{r}\n" for i, r in enumerate(reads))
    )
    obj = tmp_path / "out.bwt"
    worker = tmp_path / "cli_worker.py"
    worker.write_text(CLI_WORKER)
    port = _free_port()
    src = os.path.join(os.path.dirname(__file__), "..", "src")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.abspath(src)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["DEBWT_COORDINATOR"] = f"localhost:{port}"
        env["DEBWT_NUM_PROCESSES"] = "2"
        env["DEBWT_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), "-o", str(obj), "--dist", "8",
             str(fasta)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    try:
        for p in procs:
            o, e = p.communicate(timeout=420)
            assert p.returncode == 0, e.decode()[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    from debwt_tpu.golden import golden_bwt
    from debwt_tpu.types import SequenceCollection

    coll = SequenceCollection.from_reads(reads)
    g = golden_bwt(coll)
    assert obj.read_bytes() == g.packed()
    sharp = np.frombuffer((tmp_path / "out.bwt.#").read_bytes(), "<u8")
    dollar = np.frombuffer((tmp_path / "out.bwt.$").read_bytes(), "<u8")
    assert (sharp.astype(np.int64) == g.sharp_pos).all()
    assert int(dollar[0]) == g.dollar_pos
