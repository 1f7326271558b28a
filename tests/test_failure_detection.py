"""Engine-side failure detection.

The reference keeps vLLM's worker monitor + termination
(reference ``ulysses.py:408-414``); here the equivalents are:

- multihost leader watchdog (follower EOF / heartbeat silence ->
  clean engine error instead of a leader blocked in a collective),
- follower suicide on leader loss,
- AsyncLLMEngine.mark_dead + stall detection surfaced via /health,
- router restart of exited/wedged spawned replicas.
"""

import signal
import socket
import subprocess
import sys
import threading
import time
import urllib.request
import urllib.error

import pytest

from arcticinference_tpu.parallel.multihost import (FollowerChannel,
                                                    LeaderChannel)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


class TestChannelWatchdog:

    def _pair(self, heartbeat=True):
        port = _free_port()
        leader = LeaderChannel(1, port, bind_host="127.0.0.1",
                               accept_timeout=30.0)
        follower_box = {}

        def connect():
            follower_box["ch"] = FollowerChannel(
                "127.0.0.1", port, heartbeat=heartbeat)

        t = threading.Thread(target=connect)
        t.start()
        leader.wait_connected()
        t.join()
        return leader, follower_box["ch"]

    def test_follower_disconnect_detected(self):
        leader, follower = self._pair()
        failures = []
        leader.start_watchdog(lambda i, r: failures.append((i, r)),
                              timeout=30.0)
        time.sleep(0.2)
        follower.close()  # simulates a crashed follower process
        deadline = time.time() + 10
        while not failures and time.time() < deadline:
            time.sleep(0.05)
        assert failures and failures[0][1] == "disconnected", failures
        assert leader.failed is not None
        leader.close()

    def test_heartbeat_timeout_detected(self):
        # A follower that connects but never heartbeats == wedged.
        leader, follower = self._pair(heartbeat=False)
        failures = []
        leader.start_watchdog(lambda i, r: failures.append((i, r)),
                              timeout=1.5)
        deadline = time.time() + 10
        while not failures and time.time() < deadline:
            time.sleep(0.05)
        assert failures and failures[0][1] == "heartbeat timeout", failures
        follower.close()
        leader.close()

    def test_healthy_follower_not_flagged(self):
        leader, follower = self._pair()
        failures = []
        leader.start_watchdog(lambda i, r: failures.append((i, r)),
                              timeout=1.5)
        time.sleep(3.0)   # several heartbeat intervals
        assert not failures
        follower.close()
        leader.close()


class TestMarkDead:

    def test_mark_dead_fails_streams_and_rejects(self):
        import asyncio

        from arcticinference_tpu.engine.async_engine import AsyncLLMEngine
        from arcticinference_tpu.engine.request import SamplingParams
        from tests.test_engine import tiny_config

        eng = AsyncLLMEngine(tiny_config())

        async def run():
            chunks = []

            async def consume():
                async for c in eng.generate(
                        [5, 6, 7],
                        SamplingParams(max_tokens=2000, ignore_eos=True),
                        "victim"):
                    chunks.append(c)

            task = asyncio.create_task(consume())
            await asyncio.sleep(0.5)
            eng.mark_dead("test-induced failure")
            await asyncio.wait_for(task, timeout=10)
            return chunks

        chunks = asyncio.new_event_loop().run_until_complete(run())
        assert chunks and chunks[-1].finished
        assert chunks[-1].finish_reason == "engine_error"
        with pytest.raises(RuntimeError, match="dead"):
            asyncio.new_event_loop().run_until_complete(
                eng.generate([1, 2], None, "after").__anext__())
        eng.close()


class TestRouterRestart:

    def test_wedged_replica_restarted(self):
        from arcticinference_tpu.serving.router import Backend, LLMRouter

        router = LLMRouter(["http://127.0.0.1:1"], restart_after=0.5)
        b = router.backends[0]
        # A "replica" that never serves HTTP (wedged from birth).
        b.spawn_cmd = [sys.executable, "-c",
                       "import time; time.sleep(600)"]
        b.spawn_env = None
        b.proc = subprocess.Popen(b.spawn_cmd)
        try:
            b.unhealthy_since = time.time() - 1.0
            old = b.proc
            router._maybe_restart(b)
            assert b.restarts == 1
            assert old.poll() is not None          # killed
            assert b.proc is not old and b.proc.poll() is None
        finally:
            if b.proc and b.proc.poll() is None:
                b.proc.kill()
                b.proc.wait()

    def test_exited_replica_restarted(self):
        from arcticinference_tpu.serving.router import Backend, LLMRouter

        router = LLMRouter(["http://127.0.0.1:1"], restart_after=600)
        b = router.backends[0]
        b.spawn_cmd = [sys.executable, "-c",
                       "import time; time.sleep(600)"]
        b.proc = subprocess.Popen([sys.executable, "-c", "pass"])
        b.proc.wait()
        try:
            router._maybe_restart(b)   # exited -> restart regardless
            assert b.restarts == 1 and b.proc.poll() is None
        finally:
            if b.proc and b.proc.poll() is None:
                b.proc.kill()
                b.proc.wait()

    def test_unmanaged_backend_never_restarted(self):
        from arcticinference_tpu.serving.router import LLMRouter

        router = LLMRouter(["http://remote:9"], restart_after=0.0)
        b = router.backends[0]
        b.unhealthy_since = time.time() - 100
        router._maybe_restart(b)
        assert b.restarts == 0
