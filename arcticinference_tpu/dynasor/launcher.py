"""Combined launcher: engine server + Dynasor proxy in one command.

Mirror of reference ``dynasor/vllm_server.py:49-123``: spawns the
OpenAI-compatible engine server on ``port+1``, health-polls it, then runs
the Dynasor proxy on the requested port in front of it.

  python -m arcticinference_tpu.dynasor.launcher --model ... --port 8000
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
import urllib.request


def wait_healthy(url: str, timeout: float, proc: subprocess.Popen) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(
                f"backend exited prematurely (code {proc.returncode})")
        try:
            with urllib.request.urlopen(url, timeout=2) as r:
                if r.status == 200:
                    return
        except Exception:
            pass
        time.sleep(1.0)
    raise TimeoutError(f"backend not healthy within {timeout}s")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--probe-interval", type=int, default=64)
    parser.add_argument("--certainty-window", type=int, default=2)
    parser.add_argument("--startup-timeout", type=float, default=1800.0)
    args, extra = parser.parse_known_args()

    backend_port = args.port + 1
    backend = subprocess.Popen(
        [sys.executable, "-m",
         "arcticinference_tpu.serving.openai_server",
         "--model", args.model, "--host", "127.0.0.1",
         "--port", str(backend_port), *extra])
    try:
        wait_healthy(f"http://127.0.0.1:{backend_port}/health",
                     args.startup_timeout, backend)
        from aiohttp import web

        from arcticinference_tpu.dynasor.proxy import DynasorProxy

        proxy = DynasorProxy(f"http://127.0.0.1:{backend_port}",
                             args.probe_interval, args.certainty_window)
        web.run_app(proxy.app, host=args.host, port=args.port)
    finally:
        backend.terminate()
        try:
            backend.wait(timeout=10)
        except subprocess.TimeoutExpired:
            backend.kill()


if __name__ == "__main__":
    main()
