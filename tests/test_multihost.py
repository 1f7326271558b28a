"""Multi-host sharded serving: a 2-process jax.distributed cluster (CPU,
Gloo collectives) runs ONE engine whose mesh spans both processes; the
leader serves HTTP and broadcasts each step to the follower mirror.

This exercises the real DCN code path (global mesh, cross-process
collectives, leader/follower step channel) end to end — the capability
the reference lacks entirely (its executor is single-node,
reference ``ulysses.py:370-374``).
"""

import json
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest

from tests.test_subprocess_servers import CFG, _env, free_port, wait_http

# 8 attention/kv heads so tp=4 divides; 4 layers.
MH_CFG = json.loads(json.dumps(CFG))
MH_CFG["model"]["hf_overrides"].update(
    num_attention_heads=8, num_key_value_heads=8, head_dim=8,
    num_hidden_layers=4)
MH_CFG["parallel"] = {"tensor_parallel_size": 4,
                      "ulysses_sequence_parallel_size": 2}

PROMPT = [3, 14, 15, 92, 65]


def _spawn(cfg_path, pid, nprocs, coord_port, channel_port, http_port):
    env = _env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    args = [sys.executable, "-m",
            "arcticinference_tpu.serving.openai_server",
            "--config", cfg_path, "--host", "127.0.0.1",
            "--port", str(http_port),
            "--multihost-coordinator", f"127.0.0.1:{coord_port}",
            "--multihost-num-processes", str(nprocs),
            "--multihost-process-id", str(pid),
            "--multihost-channel-port", str(channel_port)]
    return subprocess.Popen(args, env=env)


@pytest.fixture(scope="module")
def single_reference(tmp_path_factory):
    """Same model on one process (8 local devices, same sharded layout)
    for exact output comparison."""
    import jax

    from arcticinference_tpu.config import EngineConfig
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    cfg = EngineConfig.from_dict(json.loads(json.dumps(MH_CFG)))
    llm = LLM(cfg)
    outs = llm.generate(prompt_token_ids=[PROMPT],
                        sampling_params=SamplingParams(max_tokens=8,
                                                       temperature=0.0))
    return outs[0].token_ids


def test_multihost_suffix_decoding(tmp_path):
    """Suffix decoding (host-side drafts, verification inside the
    mirrored dispatch) runs under multi-host; outputs match the same
    spec config on a single process."""
    import jax

    from arcticinference_tpu.config import EngineConfig
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    cfg_d = json.loads(json.dumps(MH_CFG))
    cfg_d["speculative"] = {"method": "suffix"}
    # Repetitive prompt so the suffix tree actually drafts.
    prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]

    ref_llm = LLM(EngineConfig.from_dict(json.loads(json.dumps(cfg_d))))
    ref = ref_llm.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(max_tokens=12,
                                       temperature=0.0))[0].token_ids

    cfg_path = tmp_path / "mh_spec.json"
    cfg_path.write_text(json.dumps(cfg_d))
    coord, channel, http = free_port(), free_port(), free_port()
    leader = _spawn(str(cfg_path), 0, 2, coord, channel, http)
    follower = _spawn(str(cfg_path), 1, 2, coord, channel, http + 1)
    try:
        wait_http(f"http://127.0.0.1:{http}/health", leader, timeout=240)
        req = urllib.request.Request(
            f"http://127.0.0.1:{http}/v1/completions",
            data=json.dumps({"prompt_token_ids": prompt,
                             "max_tokens": 12,
                             "temperature": 0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            data = json.loads(r.read())
        assert data["choices"][0]["token_ids"] == ref
    finally:
        for proc in (leader, follower):
            proc.terminate()
        for proc in (leader, follower):
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait(timeout=10)


def test_multihost_arctic_drafter(tmp_path):
    """Model drafter (MLP speculator) under multi-host: the drafter chain
    runs leader-local on the replicated sample rows; outputs must match
    the same spec config on a single process exactly (greedy verification
    is draft-invariant)."""
    from arcticinference_tpu.config import EngineConfig
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    cfg_d = json.loads(json.dumps(MH_CFG))
    cfg_d["speculative"] = {"method": "arctic",
                            "num_speculative_tokens": 3}
    prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]

    ref_llm = LLM(EngineConfig.from_dict(json.loads(json.dumps(cfg_d))))
    assert ref_llm.engine._drafter is not None
    ref = ref_llm.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(max_tokens=12,
                                       temperature=0.0))[0].token_ids

    cfg_path = tmp_path / "mh_arctic.json"
    cfg_path.write_text(json.dumps(cfg_d))
    coord, channel, http = free_port(), free_port(), free_port()
    leader = _spawn(str(cfg_path), 0, 2, coord, channel, http)
    follower = _spawn(str(cfg_path), 1, 2, coord, channel, http + 1)
    try:
        wait_http(f"http://127.0.0.1:{http}/health", leader, timeout=240)
        req = urllib.request.Request(
            f"http://127.0.0.1:{http}/v1/completions",
            data=json.dumps({"prompt_token_ids": prompt,
                             "max_tokens": 12,
                             "temperature": 0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            data = json.loads(r.read())
        assert data["choices"][0]["token_ids"] == ref
        assert follower.poll() is None       # mirror still alive
    finally:
        for proc in (leader, follower):
            proc.terminate()
        for proc in (leader, follower):
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait(timeout=10)


_FUSED_DRIVER = r"""
import sys, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from arcticinference_tpu.parallel import multihost
pid = int(sys.argv[1])
multihost.initialize(sys.argv[2], 2, pid)
from arcticinference_tpu.config import EngineConfig
from arcticinference_tpu.engine.engine import LLMEngine
from arcticinference_tpu.engine.request import SamplingParams

engine = LLMEngine(EngineConfig.from_dict(json.loads(sys.argv[4])))
prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
if pid == 0:
    ch = multihost.LeaderChannel(1, int(sys.argv[3]))
    ch.wait_connected()
    engine.runner.mh_channel = ch
    engine.add_request("r0", prompt, SamplingParams(max_tokens=12))
    done, fused_steps = {{}}, 0
    while engine.has_unfinished:
        fused_steps += bool(engine._fused and engine._fused.active)
        for r in engine.step():
            done[r.req_id] = r.output_token_ids
    ch.close()
    print("RESULT", json.dumps({{"tokens": done["r0"],
                                 "fused_steps": fused_steps,
                                 "drafts": engine.spec_stats.num_drafts}}))
else:
    chan = multihost.FollowerChannel("127.0.0.1", int(sys.argv[3]))
    multihost.follower_serve(engine, chan)
"""


def test_multihost_fused_decode(tmp_path):
    """The fused spec-decode loop engages under multi-host: every fused
    step is broadcast to the follower mirror and outputs match the same
    config on a single process exactly."""
    import os

    from arcticinference_tpu.config import EngineConfig
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    cfg_d = json.loads(json.dumps(MH_CFG))
    cfg_d["speculative"] = {"method": "suffix"}
    prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
    ref_llm = LLM(EngineConfig.from_dict(json.loads(json.dumps(cfg_d))))
    ref = ref_llm.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(max_tokens=12,
                                       temperature=0.0))[0].token_ids

    script = tmp_path / "fused_driver.py"
    script.write_text(_FUSED_DRIVER.format(
        repo=str(os.path.dirname(os.path.dirname(__file__)))))
    coord, channel = free_port(), free_port()
    env = _env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    def spawn(pid):
        return subprocess.Popen(
            [sys.executable, "-u", str(script), str(pid),
             f"127.0.0.1:{coord}", str(channel), json.dumps(cfg_d)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)

    leader, follower = spawn(0), spawn(1)
    try:
        out, _ = leader.communicate(timeout=240)
        follower.wait(timeout=60)
    except subprocess.TimeoutExpired:
        leader.kill()
        follower.kill()
        raise
    line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
    assert line, out[-2000:]
    res = json.loads(line[0][len("RESULT "):])
    assert res["tokens"] == ref
    assert res["fused_steps"] > 0        # the loop really engaged
    assert res["drafts"] > 0             # and drafted


def test_two_process_sharded_serving(tmp_path, single_reference):
    cfg_path = tmp_path / "mh.json"
    cfg_path.write_text(json.dumps(MH_CFG))
    coord, channel, http = free_port(), free_port(), free_port()
    leader = _spawn(str(cfg_path), 0, 2, coord, channel, http)
    follower = _spawn(str(cfg_path), 1, 2, coord, channel, http + 1)
    try:
        wait_http(f"http://127.0.0.1:{http}/health", leader, timeout=240)
        req = urllib.request.Request(
            f"http://127.0.0.1:{http}/v1/completions",
            data=json.dumps({"prompt_token_ids": PROMPT,
                             "max_tokens": 8,
                             "temperature": 0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            data = json.loads(r.read())
        got = data["choices"][0]["token_ids"]
        assert got == single_reference
        # A second request exercises the warm path (compiled fns, prev
        # token passthrough in the async pipeline).
        with urllib.request.urlopen(req, timeout=120) as r:
            data2 = json.loads(r.read())
        assert data2["choices"][0]["token_ids"] == single_reference
        assert follower.poll() is None       # mirror still alive
    finally:
        for proc in (leader, follower):
            proc.terminate()
        for proc in (leader, follower):
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                # jax.distributed/Gloo service threads can swallow the
                # first SIGTERM; escalate (exact PIDs only).
                proc.kill()
                proc.wait(timeout=10)


def test_follower_kill_surfaces_clean_error(tmp_path):
    """Kill the follower mid-stream (SIGKILL): the leader's watchdog must
    mark the engine dead and /health must report 503 engine_error — a
    clean failure instead of a leader blocked in a collective forever
    (the reference keeps vLLM's worker monitor for this,
    ulysses.py:408-414)."""
    import os
    import signal

    cfg_path = tmp_path / "mh_kill.json"
    cfg_path.write_text(json.dumps(MH_CFG))
    coord, channel, http = free_port(), free_port(), free_port()
    leader = _spawn(str(cfg_path), 0, 2, coord, channel, http)
    follower = _spawn(str(cfg_path), 1, 2, coord, channel, http + 1)
    try:
        wait_http(f"http://127.0.0.1:{http}/health", leader, timeout=240)
        follower.send_signal(signal.SIGKILL)
        follower.wait(timeout=10)
        deadline = time.time() + 60
        status = None
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{http}/health",
                        timeout=5) as r:
                    status = r.status
            except urllib.error.HTTPError as e:
                status = e.code
                if status == 503:
                    body = json.loads(e.read())
                    assert body["status"] == "engine_error", body
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert status == 503, status
    finally:
        for proc in (leader, follower):
            if proc.poll() is None:
                proc.terminate()
        for proc in (leader, follower):
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait(timeout=10)


def test_multihost_dp_engine(tmp_path):
    """In-engine dp on a mesh spanning two processes (dp2 x tp4): the
    leader's dp-stacked step arrays broadcast to the follower mirror
    like any step, and outputs match the same config on one process."""
    import jax

    from arcticinference_tpu.config import EngineConfig
    from arcticinference_tpu.engine.llm import LLM
    from arcticinference_tpu.engine.request import SamplingParams

    cfg_d = json.loads(json.dumps(MH_CFG))
    cfg_d["parallel"] = {"data_parallel_size": 2,
                         "tensor_parallel_size": 4}

    prompts = [[3, 14, 15, 92, 65], [27, 18, 28]]
    ref_llm = LLM(EngineConfig.from_dict(json.loads(json.dumps(cfg_d))))
    ref = [o.token_ids for o in ref_llm.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(max_tokens=8, temperature=0.0))]

    cfg_path = tmp_path / "mh_dp.json"
    cfg_path.write_text(json.dumps(cfg_d))
    coord, channel, http = free_port(), free_port(), free_port()
    leader = _spawn(str(cfg_path), 0, 2, coord, channel, http)
    follower = _spawn(str(cfg_path), 1, 2, coord, channel, http + 1)
    try:
        wait_http(f"http://127.0.0.1:{http}/health", leader, timeout=240)
        for want, prompt in zip(ref, prompts):
            req = urllib.request.Request(
                f"http://127.0.0.1:{http}/v1/completions",
                data=json.dumps({"prompt_token_ids": prompt,
                                 "max_tokens": 8,
                                 "temperature": 0}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=180) as r:
                data = json.loads(r.read())
            assert data["choices"][0]["token_ids"] == want
    finally:
        for proc in (leader, follower):
            proc.terminate()
        for proc in (leader, follower):
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait(timeout=10)
