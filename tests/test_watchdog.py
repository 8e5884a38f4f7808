"""Watchdog contract (pdunet_tpu/utils/watchdog.py): a silent process dies
with exit 87 once the timeout lapses; a beating one survives. Subprocess-
based because the abort path is os._exit (the main thread may be wedged
inside a backend RPC that never returns)."""

import subprocess
import sys

from pdunet_tpu.utils.watchdog import WATCHDOG_EXIT_CODE


def _run(body: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c",
         "from pdunet_tpu.utils import watchdog\nimport time\n" + body],
        capture_output=True, text=True, timeout=60)


def test_silent_process_aborts_with_exit_87():
    r = _run("watchdog.start(0.3)\ntime.sleep(30)\nprint('survived')")
    assert r.returncode == WATCHDOG_EXIT_CODE
    assert "survived" not in r.stdout
    assert "no progress" in r.stderr


def test_beating_process_survives():
    r = _run(
        "watchdog.start(1.0)\n"
        "for _ in range(8):\n"
        "    time.sleep(0.3)\n"
        "    watchdog.beat()\n"
        "print('survived')")
    assert r.returncode == 0
    assert "survived" in r.stdout


def test_disabled_watchdog_is_inert():
    r = _run("watchdog.start(0)\nwatchdog.beat()\nprint('ok')")
    assert r.returncode == 0 and "ok" in r.stdout
