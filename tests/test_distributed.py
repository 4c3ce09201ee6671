"""Multi-host (DCN) runtime: 2 localhost processes x 2 fake CPU devices.

The reference has no distributed anything (SURVEY.md §2.4); these tests
validate the rebuild's ``jax.distributed`` bootstrap, per-host slide
sharding, cross-process collectives, and the batch_segment example's
multi-host sweep, using two subprocess workers sharing a coordinator.
"""

import json
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


def _worker_env(extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra or {})
    return env


def _run_pair(argv_fn, env_extra=None, timeout=300):
    """Launch process 0 and 1 concurrently; return their CompletedProcesses."""
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = _worker_env(env_extra)
        # per-process DPAI cache => per-process XLA compile cache: a shared
        # persistent cache can hold AOT results from another machine profile
        # (SIGILL risk) and the two workers would race on it
        if env_extra and "DPAI_CACHE" in env_extra:
            env["DPAI_CACHE"] = env_extra["DPAI_CACHE"] + f"-p{pid}"
        procs.append(
            subprocess.Popen(argv_fn(pid, port), env=env,
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append((p.returncode, out))
    return outs


WORKER = textwrap.dedent("""
    import json, sys
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    from digipathai_tpu.parallel import distributed as dist
    dist.initialize(coordinator=coordinator, num_processes=2, process_id=pid)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 4  # global view across hosts

    # cross-process collective over the global mesh (the DCN analog):
    # shard a vector over all 4 devices, psum it with shard_map
    mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("dp",))
    from jax.experimental.shard_map import shard_map
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")),
        np.full((2,), float(pid + 1), np.float32), (4,))
    total = jax.jit(shard_map(
        lambda v: jax.lax.psum(v.sum(), "dp"), mesh=mesh,
        in_specs=P("dp"), out_specs=P()))(x)
    # host0 contributes 1+1, host1 contributes 2+2
    psum_val = float(jax.device_get(total))

    shard = dist.shard_slides([f"s{i}" for i in range(5)])
    grand = dist.all_hosts_total(len(shard))
    dist.barrier("test")
    print("RESULT " + json.dumps(
        {"pid": pid, "psum": psum_val, "shard": shard, "grand": grand}))
""")


class TestDistributedRuntime:
    def test_two_process_bootstrap_collective_and_sharding(self, tmp_path):
        script = tmp_path / "worker.py"
        script.write_text(WORKER)

        def argv(pid, port):
            return [sys.executable, str(script), f"127.0.0.1:{port}", str(pid)]

        outs = _run_pair(argv)
        results = {}
        for rc, out in outs:
            assert rc == 0, out
            line = next(ln for ln in out.splitlines() if ln.startswith("RESULT "))
            r = json.loads(line[len("RESULT "):])
            results[r["pid"]] = r
        assert results[0]["psum"] == results[1]["psum"] == 6.0
        # round-robin sharding: disjoint, covering
        assert results[0]["shard"] == ["s0", "s2", "s4"]
        assert results[1]["shard"] == ["s1", "s3"]
        assert results[0]["grand"] == results[1]["grand"] == 5.0

    def test_batch_segment_multihost_sweep(self, tmp_path):
        """Two hosts split a 3-slide directory and both finish their share;
        every slide ends up with mask artifacts exactly once."""
        from tests.fixtures import make_synthetic_slide

        d = tmp_path / "slides"
        d.mkdir()
        for i in range(3):
            make_synthetic_slide(str(d / f"s{i}.tiff"), 512, 512, seed=40 + i)

        def argv(pid, port):
            return [sys.executable, os.path.join(REPO, "examples", "batch_segment.py"),
                    str(d), "--quick", "--model", "oracle", "--mode", "breast",
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", "2", "--process-id", str(pid)]

        outs = _run_pair(
            argv, env_extra={"DPAI_OFFLINE": "1",
                             "DPAI_CACHE": str(tmp_path / "cache")},
            timeout=600)
        for rc, out in outs:
            assert rc == 0, out
            assert "all hosts segmented 3 slides" in out
        import re

        host_counts = sorted(
            len(re.findall(r"^\[\d+/\d+\] s\d\.tiff", out, re.M))
            for _, out in outs)
        assert host_counts == [1, 2]
        masks = sorted(p.name for p in d.glob("*-dgai-mask*"))
        assert masks == ["s0-dgai-mask.tiff", "s1-dgai-mask.tiff",
                         "s2-dgai-mask.tiff"]


def test_single_process_noop():
    """Without coordinator/env, the module is inert and helpers degrade to
    single-host semantics (this in-suite process)."""
    from digipathai_tpu.parallel import distributed as dist

    assert dist.shard_slides(["a", "b"]) in (["a", "b"],)
    dist.barrier()  # no-op
    assert dist.all_hosts_total(3.5) == 3.5
