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


TINY = dict(num_classes=3, embed_dim=(8, 16, 24, 32), backbone_heads=4,
            T=1, feat_channels=16, num_queries=4, num_decoder_layers=1,
            num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
            dcn_group=4)


def _toy_batch():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.float32)
    sem = rng.integers(0, 3, (4, 32, 32)).astype(np.int32)
    return images, sem


def _single_process_reference():
    """Ground truth: the same 2 train steps on one device, no mesh."""
    import jax
    import jax.numpy as jnp

    from spike2former_tpu.engine import (init_state, make_optimizer,
                                         make_train_step)
    from spike2former_tpu.models import Spike2Former

    model = Spike2Former(**TINY)
    images, sem = _toy_batch()
    images_j, sem_j = jnp.asarray(images), jnp.asarray(sem)
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), images_j, True)["params"],
        base_lr=1e-3, warmup_iters=10, total_iters=100, clip_norm=1.0)
    state = init_state(model, tx, jax.random.PRNGKey(0), images_j)
    step = jax.jit(make_train_step(model, tx, num_classes=3, max_gt=4))
    totals = []
    for _ in range(2):
        state, metrics = step(state, images_j, sem_j)
        totals.append(float(metrics["total"]))
    fingerprint = float(sum(
        jnp.sum(jnp.abs(p.astype(jnp.float64)))
        for p in jax.tree_util.tree_leaves(state.params)))
    return totals, fingerprint


_TRAIN_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np
    import jax.numpy as jnp

    coord, pid = sys.argv[1], int(sys.argv[2])
    from spike2former_tpu.parallel import (distributed_init, make_mesh,
                                           replicate, shard_batch)
    ppid, pcount = distributed_init(coord, 2, pid)
    assert pcount == 2 and jax.device_count() == 4

    from spike2former_tpu.engine import (init_state, make_optimizer,
                                         make_train_step)
    from spike2former_tpu.models import Spike2Former

    TINY = dict(num_classes=3, embed_dim=(8, 16, 24, 32), backbone_heads=4,
                T=1, feat_channels=16, num_queries=4, num_decoder_layers=1,
                num_encoder_layers=1, depths_stage3=1, depths_stage4=1,
                dcn_group=4)
    model = Spike2Former(**TINY)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.float32)
    sem = rng.integers(0, 3, (4, 32, 32)).astype(np.int32)

    # identical deterministic init on every process (same seed)
    sample = jnp.asarray(images)
    tx = make_optimizer(
        model.init(jax.random.PRNGKey(0), sample, True)["params"],
        base_lr=1e-3, warmup_iters=10, total_iters=100, clip_norm=1.0)
    state = init_state(model, tx, jax.random.PRNGKey(0), sample)

    mesh = make_mesh()
    state = replicate(mesh, state)
    # DDP loader convention: each process contributes its LOCAL half of
    # the global batch of 4
    lo, hi = 2 * ppid, 2 * ppid + 2
    gi, gs = shard_batch(mesh, (jnp.asarray(images[lo:hi]),
                                jnp.asarray(sem[lo:hi])))
    assert gi.shape[0] == 4, gi.shape

    step = jax.jit(make_train_step(model, tx, num_classes=3, max_gt=4))
    totals = []
    for _ in range(2):
        state, metrics = step(state, gi, gs)
        totals.append(float(metrics["total"]))
    fingerprint = float(sum(
        jnp.sum(jnp.abs(p.astype(jnp.float64)))
        for p in jax.tree_util.tree_leaves(state.params)))
    print(f"proc {ppid}: TRAIN_OK totals={totals[0]!r},{totals[1]!r} "
          f"fp={fingerprint!r}")
""")


def _launch_pair(tmp_path, script_text, timeout=900, extra_args=()):
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()
    coord = f"localhost:{port}"

    script = tmp_path / "worker.py"
    script.write_text(script_text)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i), *extra_args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    return outs


def test_two_process_train_step_bitwise_synchronized(tmp_path):
    """The REAL operational surface (round-3 VERDICT item 4): 2 processes
    run the full make_train_step (matching + losses + AdamW) on a mesh
    spanning both; their losses and post-step parameters must be
    BITWISE-identical to each other (same SPMD program), and must match a
    single-process run on the same global batch numerically."""
    outs = _launch_pair(tmp_path, _TRAIN_WORKER)
    lines = []
    for out in outs:
        (line,) = [ln for ln in out.splitlines() if "TRAIN_OK" in ln]
        lines.append(line.split("TRAIN_OK ")[1])
    # cross-process: identical SPMD program => identical repr, bit for bit
    assert lines[0] == lines[1], f"\n{lines[0]}\n{lines[1]}"

    totals_s = lines[0].split("totals=")[1].split(" fp=")[0]
    t1, t2 = (float(x) for x in totals_s.split(","))
    fp = float(lines[0].split("fp=")[1])

    ref_totals, ref_fp = _single_process_reference()
    np.testing.assert_allclose([t1, t2], ref_totals, rtol=2e-4)
    np.testing.assert_allclose(fp, ref_fp, rtol=2e-5)


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


def test_train_cli_two_process(tmp_path):
    """Drive tools/train.py itself across 2 processes (the dist_train.sh
    surface): global batch 2 -> local batch 1 per process, 2 iters."""
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "ade"
    for split in ("training", "validation"):
        (root / "images" / split).mkdir(parents=True)
        (root / "annotations" / split).mkdir(parents=True)
        for i in range(4):
            h, w = 70, 80
            Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(
                np.uint8)).save(root / "images" / split / f"im{i}.jpg")
            Image.fromarray(rng.integers(0, 3, (h, w)).astype(
                np.uint8)).save(root / "annotations" / split / f"im{i}.png")

    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()

    repo = os.path.dirname(os.path.dirname(__file__))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # one device per process: the global mesh is 2 devices, matching the
    # global batch of 2 (1 image per process per step)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, os.path.join(repo, "tools", "train.py"),
           "SDTv2_maskformer_DCNpixelDecoder_ade20k",
           "--device", "cpu", "--data-root", str(root),
           "--work-dir", str(tmp_path / "wd"),
           "--coordinator", f"localhost:{port}", "--num-processes", "2",
           "--log-interval", "1", "--eval-images", "0",
           "--cfg-options", "model.num_classes=3",
           "model.embed_dim=(8,16,24,32)", "model.backbone_heads=4",
           "model.feat_channels=16", "model.num_queries=4",
           "model.num_decoder_layers=1", "model.num_encoder_layers=1",
           "model.depths_stage3=1", "model.depths_stage4=1",
           "model.dcn_group=4", "data.crop_size=(32,32)",
           "data.batch_size=2", "data.num_workers=1",
           "train.total_iters=2", "train.checkpoint_interval=100",
           "train.val_interval=0", "train.warmup_iters=1",
           "train.max_gt=4", "train.loss_at=pred"]
    procs = [subprocess.Popen(cmd + ["--process-id", str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "distributed: process" in out
        assert "2 global devices" in out
    # both processes log the SAME synchronized global loss
    def last_loss(out):
        lines = [ln for ln in out.splitlines() if ln.startswith("iter 2/")]
        return lines[-1].split("loss ")[1].split(" ")[0]
    assert last_loss(outs[0]) == last_loss(outs[1])


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
