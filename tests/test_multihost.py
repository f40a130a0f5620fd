"""Multi-host bring-up tests.

1. RequestBridge lockstep: a leader engine publishes its intake sequence
   over the TCP bridge; a follower engine replica replays it and produces
   identical tokens (the SPMD replicated-scheduler invariant the
   multi-host design rests on; reference: communicator.rs daemon
   broadcast, here replaced by intake replication).
2. ``jax.distributed`` 2-process CPU bring-up: two coordinated processes
   build one global mesh and run the same psum program (reference:
   multi-node NCCL bootstrap, communicator.rs:218-324).
"""

import os
import subprocess
import sys
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from candle_vllm_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
from candle_vllm_tpu.engine.llm_engine import LLMEngine
from candle_vllm_tpu.parallel.multihost import (
    FollowerLink,
    IntakeEvent,
    RequestBridge,
)
from candle_vllm_tpu.sampling_params import SamplingParams


def make_engine():
    cfg = ModelConfig(
        architecture="LlamaForCausalLM",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=128,
        max_model_len=128,
        dtype=jnp.float32,
        eos_token_ids=[],
    )
    return LLMEngine(
        cfg,
        CacheConfig(block_size=8, num_gpu_blocks=32, num_cpu_blocks=0),
        SchedulerConfig(max_model_len=128, preemption_mode="recompute"),
        seed=0,
    )


def test_request_bridge_lockstep():
    port = 19431
    leader = make_engine()
    follower = make_engine()

    bridge = RequestBridge(port, num_followers=1)
    follower_tokens = {}

    def follower_main():
        link = FollowerLink("127.0.0.1", port)

        def on_step(outs):
            for o in outs:
                follower_tokens[o.request_id] = o.outputs[0].token_ids

        link.run_engine_loop(follower, on_step=on_step)
        link.close()

    t = threading.Thread(target=follower_main)
    t.start()
    bridge.wait_for_followers()

    rng = np.random.default_rng(0)
    prompts = {
        f"r{i}": rng.integers(0, 128, size=rng.integers(4, 20)).tolist()
        for i in range(3)
    }
    sampling = {"temperature": 0.0, "max_tokens": 6}
    leader_tokens = {}
    for rid, ids in prompts.items():
        leader.add_request(rid, prompt_token_ids=ids,
                           sampling_params=SamplingParams(**sampling))
        bridge.publish(IntakeEvent(kind="add", request_id=rid,
                                   prompt_token_ids=ids, sampling=sampling))
    while leader.has_unfinished_requests():
        bridge.publish(IntakeEvent(kind="step"))
        for o in leader.step():
            leader_tokens[o.request_id] = o.outputs[0].token_ids
    bridge.close()
    t.join(timeout=60)
    assert not t.is_alive()
    assert leader_tokens == follower_tokens
    assert len(leader_tokens) == 3


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=2"
sys.path.insert(0, os.environ["CVT_REPO"])
import jax
from candle_vllm_tpu.parallel.multihost import init_distributed
init_distributed()
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
assert len(devs) == 4, devs
mesh = Mesh(np.asarray(devs).reshape(2, 2), ("dp", "tp"))
x = jnp.arange(32, dtype=jnp.float32).reshape(4, 8)
w = jnp.arange(64, dtype=jnp.float32).reshape(8, 8) * 0.01

@jax.jit
def step(x, w):
    y = jnp.dot(x, w)
    return jnp.sum(y * y)

xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
ws = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))
out = step(xs, ws)
print("CHECKSUM", float(np.asarray(out)), flush=True)
"""


def test_jax_distributed_two_process_cpu(tmp_path):
    env_base = {
        **os.environ,
        "CVT_REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CVT_COORDINATOR": "127.0.0.1:19542",
        "CVT_NUM_PROCESSES": "2",
        "PALLAS_AXON_POOL_IPS": "",
    }
    procs = []
    for rank in range(2):
        env = dict(env_base, CVT_PROCESS_ID=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("jax.distributed CPU bring-up timed out")
        outs.append(out)
    if any(p.returncode != 0 for p in procs):
        pytest.skip(f"jax.distributed unsupported on this build: {outs}")
    sums = [
        line.split()[1]
        for out in outs
        for line in out.splitlines()
        if line.startswith("CHECKSUM")
    ]
    assert len(sums) == 2 and sums[0] == sums[1]


def test_intake_event_mm_roundtrip():
    from candle_vllm_tpu.multimodal.processor import MultiModalInputs

    rng = np.random.default_rng(0)
    mm = MultiModalInputs(
        patches=rng.normal(size=(16, 24)).astype(np.float32),
        grids=[(1, 4, 4)],
        seed=12345,
        merge_unit=4,
    )
    ev = IntakeEvent(kind="add", request_id="x", mm=IntakeEvent.encode_mm(mm))
    ev2 = IntakeEvent.from_wire(ev.to_wire())
    back = IntakeEvent.decode_mm(ev2.mm)
    np.testing.assert_array_equal(back.patches, mm.patches)
    assert back.grids == mm.grids and back.seed == mm.seed
