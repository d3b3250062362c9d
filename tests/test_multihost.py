"""Multi-host plumbing: per-host data sharding + a real 2-process CPU run
through jax.distributed (the reference's dist_train.sh / slurm world,
SURVEY §2.13)."""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

from spike2former_tpu.data import TrainLoader


class _FakeDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def load(self, i):
        # sample identity carried in the (augmentation-proof) seg map
        img = np.full((40, 40, 3), i, np.uint8)
        return {"image": img, "sem_seg": np.full((40, 40), i, np.uint8),
                "meta": {}}


def test_loader_host_sharding_disjoint_and_complete():
    """Two processes with the same seed must consume disjoint halves of
    each epoch permutation."""
    seen = []
    for pid in (0, 1):
        loader = TrainLoader(_FakeDS(8), batch_size=2, crop_size=(32, 32),
                             seed=7, num_workers=2, infinite=False,
                             process_id=pid, process_count=2)
        ids = []
        for _, segs in loader:
            for s in segs:
                vals = s[s != 255]
                ids.append(int(np.bincount(vals).argmax()))
        loader.close()
        seen.append(set(ids))
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == set(range(8))


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    coord, pid = sys.argv[1], int(sys.argv[2])
    from spike2former_tpu.parallel import distributed_init, make_mesh, \\
        shard_batch
    ppid, pcount = distributed_init(coord, 2, pid)
    assert pcount == 2, pcount
    assert jax.device_count() == 4, jax.device_count()

    mesh = make_mesh()
    # each process contributes its local half of a global batch of 4
    local = np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 10 * pid
    (gbatch,) = shard_batch(mesh, (local,))
    assert gbatch.shape == (4, 3), gbatch.shape

    total = jax.jit(lambda x: jnp.sum(x))(gbatch)
    want = float(np.arange(6).reshape(2, 3).sum() * 2 + 10 * 6)
    assert abs(float(total) - want) < 1e-5, (float(total), want)
    print(f"proc {ppid}: OK total={float(total)}")
""")


def test_two_process_cpu_distributed(tmp_path):
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()
    coord = f"localhost:{port}"

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "OK total=" in out
