"""Multi-host helpers + a real two-process CPU decode smoke test."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.parallel import multihost


class TestHostRanges:
    def test_window_split_balanced(self):
        assert multihost.host_window_range(10, 2, 0) == (0, 5)
        assert multihost.host_window_range(10, 2, 1) == (5, 10)
        assert multihost.host_window_range(3, 2, 0) == (0, 2)
        assert multihost.host_window_range(3, 2, 1) == (2, 3)

    def test_sample_range_includes_halo(self):
        lo, hi = multihost.host_sample_range(4, 2, 0)
        assert lo == 0
        # windows 0,1 -> last window starts at HOP, ends at HOP+WINDOW
        assert hi == C.HOP_LEN + C.WINDOW_LEN
        lo1, hi1 = multihost.host_sample_range(4, 2, 1)
        assert lo1 == 2 * C.HOP_LEN  # host 1 starts reading at window 2's start
        assert hi1 == 3 * C.HOP_LEN + C.WINDOW_LEN
        # adjacent hosts overlap by exactly the halo
        assert hi > lo1

    def test_iq_doubles_sample_counts(self):
        lo, hi = multihost.host_sample_range(2, 1, 0, read_mode=2)
        assert (lo, hi) == (0, (C.HOP_LEN + C.WINDOW_LEN) * 2)


class TestAddressableRows:
    """The runner's local-row materialization: global batch rows assembled
    from addressable shards only (no collective), allgather reserved for
    the None fallback."""

    def test_time_freq_sharded_rows(self):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, axis_names=("time", "freq"))
        x = np.arange(8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
        xs = jax.device_put(x, NamedSharding(mesh, P("time", "freq", None)))
        for lo, hi in ((0, 4), (4, 8), (2, 6), (0, 8)):
            got = multihost.addressable_rows(xs, lo, hi)
            assert got is not None
            np.testing.assert_array_equal(got, x[lo:hi])

    def test_replicated_and_1d(self):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, axis_names=("time", "freq"))
        v = np.arange(8, dtype=np.int32)
        vs = jax.device_put(v, NamedSharding(mesh, P("time")))
        np.testing.assert_array_equal(
            multihost.addressable_rows(vs, 2, 7), v[2:7])
        # plain numpy passes through
        np.testing.assert_array_equal(
            multihost.addressable_rows(v, 1, 3), v[1:3])

    def test_axis2_sharded_leaf_falls_back(self):
        """A leaf sharded on an axis >= 2 must return None (collective
        fallback), not assemble partial shard writes as full coverage —
        coverage is only tracked over the first two axes (review fix)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, axis_names=("time", "freq"))
        x = np.arange(8 * 3 * 8, dtype=np.float32).reshape(8, 3, 8)
        xs = jax.device_put(x, NamedSharding(mesh, P("time", None, "freq")))
        assert multihost.addressable_rows(xs, 0, 4) is None


_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"

    from msk144cudecoder_tpu import constants as C, golden as G
    from msk144cudecoder_tpu.config import DecoderConfig
    from msk144cudecoder_tpu.ops import pipeline
    from msk144cudecoder_tpu.parallel import multihost
    from msk144cudecoder_tpu.parallel.sharding import MeshDecoder
    from msk144cudecoder_tpu.protocol import msg77

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    multihost.init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc

    mesh = multihost.global_mesh()  # time = 2 processes, freq = 4 local devices
    cfg = DecoderConfig(search_width=100.0, scan_depth=2, max_survivors=64)

    # the full stream is 2 windows; each host frames its own segment
    rng = np.random.default_rng(5)
    audio = G.synthesize_audio_int16([("CQ K1ABC FN42", 1500.0)], 6, snr_db=10.0, rng=rng)
    stream = np.concatenate([audio, audio[:C.HOP_LEN]])  # 2 windows worth
    lo, hi = multihost.host_sample_range(2, nproc, pid)
    local = stream[lo:hi]
    wlo, whi = multihost.host_window_range(2, nproc, pid)
    n_local = whi - wlo
    windows = np.stack([local[i * C.HOP_LEN : i * C.HOP_LEN + C.WINDOW_LEN]
                        for i in range(n_local)])

    md = MeshDecoder(cfg, mesh)
    garr = multihost.global_windows(windows, mesh)
    res = md.decode(garr)

    # results are time-sharded across processes: allgather then slice ours
    from jax.experimental import multihost_utils
    bits = np.asarray(multihost_utils.process_allgather(res.message_bits, tiled=True))[wlo:whi]
    fl = np.asarray(multihost_utils.process_allgather(res.found, tiled=True))[wlo:whi]
    h = msg77.CallsignHashTable()
    texts = set()
    for b in range(n_local):
        for k in np.nonzero(fl[b])[0]:
            ok, t = msg77.unpack77(pipeline.unpack_message_bits(bits[b][k]), h)
            if ok: texts.add(t)
    assert "CQ K1ABC FN42" in texts, texts
    print(f"proc {pid} OK {sorted(texts)}")
""")


def _parallel_capture(tmp_path):
    """5-window capture: message A in windows 0-1 (time row 0 of a (2, x)
    mesh), message B in windows 3-4 (time row 1)."""
    from msk144cudecoder_tpu import golden as G

    rng = np.random.default_rng(5)
    a1 = G.synthesize_audio_int16([("CQ K1ABC FN42", 1500.0)], 6,
                                  snr_db=10.0, rng=rng)
    a2 = G.synthesize_audio_int16([("K1ABC W9XYZ R-03", 1480.0)], 6,
                                  snr_db=10.0, rng=rng)
    noise = (rng.normal(0, 1000, C.HOP_LEN * 2)).astype(np.int16)
    path = tmp_path / "capture.raw"
    path.write_bytes(np.concatenate([a1, noise, a2]).tobytes())
    return str(path)


def _parallel_cli_env(devices_per_process: int = 8):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count="
                        + str(devices_per_process)).strip()
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    return env


class TestParallelCli:
    def test_single_process_time_freq_mesh(self, tmp_path):
        """`python -m msk144cudecoder_tpu.parallel` on one process: the
        capture is time-sharded over mesh rows and frequency-sharded within
        them; both planted messages must decode with the standard line
        format."""
        cap = _parallel_capture(tmp_path)
        proc = subprocess.run(
            [sys.executable, "-m", "msk144cudecoder_tpu.parallel",
             "--platform", "cpu", "--input", cap, "--search-width", "100",
             "--scan-depth", "3", "--mesh-time", "2", "--mesh-freq", "4"],
            capture_output=True, text=True, timeout=500,
            cwd="/root/repo", env=_parallel_cli_env())
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "msg='CQ K1ABC FN42'" in proc.stdout
        assert "msg='K1ABC W9XYZ R-03'" in proc.stdout
        assert proc.stdout.strip().endswith("Done")
        assert "Mesh: 2 (time) x 4 (freq)" in proc.stderr

    def test_iq_capture(self, tmp_path):
        """--read-mode=2: byte ranges double per sample (int8 I/Q pairs);
        the runner's segment slicing must stay sample-aligned."""
        from msk144cudecoder_tpu import golden as G

        iq = G.synthesize_iq_int8([("CQ K1ABC FN42", 20.0)], 9, snr_db=8.0,
                                  rng=np.random.default_rng(6))
        cap = tmp_path / "capture.iq"
        cap.write_bytes(iq.tobytes())
        proc = subprocess.run(
            [sys.executable, "-m", "msk144cudecoder_tpu.parallel",
             "--platform", "cpu", "--input", str(cap), "--read-mode", "2",
             "--search-width", "100", "--scan-depth", "3",
             "--mesh-time", "2", "--mesh-freq", "4"],
            capture_output=True, text=True, timeout=500,
            cwd="/root/repo", env=_parallel_cli_env())
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "msg='CQ K1ABC FN42'" in proc.stdout


@pytest.mark.slow
def test_two_process_parallel_cli(tmp_path):
    """The distributed runner end-to-end: two real jax.distributed
    processes share one capture; each decodes and prints only its own
    time rows' windows."""
    cap = _parallel_capture(tmp_path)
    env = _parallel_cli_env(devices_per_process=4)  # (2, 4) global mesh
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "msk144cudecoder_tpu.parallel",
             "--platform", "cpu", "--input", cap, "--search-width", "100",
             "--scan-depth", "3", "--mesh-freq", "4",
             "--coordinator", "localhost:52433",
             "--num-processes", "2", "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd="/root/repo", env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=500)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        outs.append((out, err))
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{err[-3000:]}"
    # windows 0-2 (message A) belong to process 0; windows 3-4 (B) to 1
    assert "msg='CQ K1ABC FN42'" in outs[0][0]
    assert "msg='K1ABC W9XYZ R-03'" not in outs[0][0]
    assert "msg='K1ABC W9XYZ R-03'" in outs[1][0]
    assert "msg='CQ K1ABC FN42'" not in outs[1][0]
    assert outs[0][0].strip().endswith("Done")


@pytest.mark.slow
def test_two_process_cpu_decode(tmp_path):
    """Real jax.distributed: 2 processes x 4 CPU devices, (2, 4) mesh."""
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = "52431"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd="/root/repo", env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
