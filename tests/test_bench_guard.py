"""bench.py's zoo-drain guard: the round-end bench must never start a TPU
process while the model-zoo evidence driver (tools/complete_zoo.sh) has a
leg in flight — the chip is single-tenant and a mid-flight kill wedges the
axon tunnel. `_drain_zoo` stops the orchestration SHELLS (found by walking
the pid-file's descendant tree — never a pattern kill) and waits for the
worker leg to exit NATURALLY. Tested here against a fake zoo tree; the
real /tmp/zoo.pid is never touched (ZOO_PID_FILE override)."""

import importlib.util
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_guard_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_drain_noop_without_pid_file(bench, tmp_path, monkeypatch):
    monkeypatch.setenv("ZOO_PID_FILE", str(tmp_path / "nope.pid"))
    t0 = time.time()
    bench._drain_zoo()          # must return immediately, no sleep
    assert time.time() - t0 < 2


def test_drain_noop_on_stale_or_reused_pid(bench, tmp_path, monkeypatch):
    # A live pid whose cmdline is NOT complete_zoo.sh (simulates pid reuse
    # after the zoo exited): must be left alone.
    probe = subprocess.Popen([sys.executable, "-c",
                              "import time; time.sleep(30)"])
    try:
        pid_file = tmp_path / "zoo.pid"
        pid_file.write_text(str(probe.pid))
        monkeypatch.setenv("ZOO_PID_FILE", str(pid_file))
        t0 = time.time()
        bench._drain_zoo()
        assert time.time() - t0 < 2
        assert probe.poll() is None   # untouched
    finally:
        probe.kill()
        probe.wait()


def test_drain_stops_shells_and_waits_out_the_worker(bench, tmp_path,
                                                     monkeypatch):
    # Fake zoo: a bash script NAMED complete_zoo.sh that spawns a python
    # worker (stands in for `timeout ... python main.py`) and then idles.
    # The drain must kill the shell, leave the worker to finish naturally
    # (it writes `done` as its last act — present iff NOT killed), and
    # only return once the worker is gone.
    done = tmp_path / "done"
    zoo = tmp_path / "complete_zoo.sh"
    zoo.write_text(
        "#!/usr/bin/env bash\n"
        "{} -c 'import time,sys; time.sleep(4); "
        "open(sys.argv[1], \"w\").write(\"ok\")' {} &\n"
        "sleep 600\n".format(sys.executable, done))
    zoo.chmod(0o755)
    proc = subprocess.Popen(["bash", str(zoo)])
    try:
        time.sleep(0.5)               # let the worker spawn
        pid_file = tmp_path / "zoo.pid"
        pid_file.write_text(str(proc.pid))
        monkeypatch.setenv("ZOO_PID_FILE", str(pid_file))
        monkeypatch.setenv("BENCH_ZOO_COOLDOWN_S", "0")
        monkeypatch.setenv("BENCH_ZOO_DRAIN_TIMEOUT", "60")
        bench._drain_zoo()
        assert proc.wait(timeout=5) != 0      # shell was SIGTERMed
        assert done.exists()                   # worker finished NATURALLY
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
