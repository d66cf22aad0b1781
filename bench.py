"""Benchmark: env frames/sec/chip for rollout+update at the flagship scale.

Workload (reference flagship, BASELINE.md): PPO + original_RND with the
dual-token ViT (dim 256, depth 3, heads 8, dim_head 32, patch 6 -> 197
tokens), 64 envs x 128 steps = 8,192 frames per parameter update, 4 epochs x
32 minibatches of 256. The environment is the deterministic synthetic
Atari-compatible env (pre-rendered frames) so the number measures the
framework, not an emulator.

Two pipelines on the SAME chip:

- **optimized** (this framework's shipped flagship config): fused dual-query
  SharedPatchStream backbone + fused FFN (the defaults the flagship .confs
  ship with since round 3; learning-equivalent on the maze A/B,
  BASELINE.md), bf16 matmuls, whole-update-in-one-jit (GAE + normalizers +
  RND + epoch x minibatch SGD as lax.scans), uint8 H2D once per rollout.
  BENCH_SHARED=0 measures the exact stacked dual-token mode instead
  (semantics-matched to the reference's two-pass math).
- **naive baseline** (the reference's execution model, faithfully
  translated): f32 everywhere, two separate encoder passes per forward,
  per-step intrinsic-reward device calls, host-side numpy minibatch
  indexing with one device transfer + one jitted grad step per minibatch
  (what DDP+torch eager does, agents.py:275-301).

Prints EXACTLY ONE JSON line in every scenario — success, chip-unavailable,
or measurement timeout:
  {"metric": ..., "value": fps_optimized | null, "unit": "frames/s",
   "vs_baseline": fps_optimized / fps_naive | null, ...}

Robustness architecture (round-4; VERDICT r3 item 1 — BENCH_r03 was
rc=124/parsed=null because the probe budget expired and the old code
"proceeded anyway" into an axon backend init that blocks indefinitely while
another process holds the tunneled chip):

- ONE wall clock. ``BENCH_TOTAL_S`` (default 1380 s) is budgeted from
  process start and covers probing AND measurement — no more additive
  900 s probe + 2100 s measurement vs a smaller external timeout.
- The parent process is stdlib-only (never imports jax, so it can never
  hang in backend init). It probes the chip in subprocesses with hard
  timeouts, reserving most of the budget for measurement; on probe-budget
  exhaustion it prints the JSON line with ``"value": null`` and an
  ``"error"`` and exits nonzero within seconds — a clean failure instead
  of a silent hang.
- The measurement runs in a supervised child (``BENCH_CHILD=1``). The
  child carries a deadline (``BENCH_DEADLINE``, absolute epoch seconds): a
  watchdog thread emits the best-available partial result at the deadline
  (optimized fps measured but naive unfinished -> vs_baseline falls back
  to the recorded 62.5 fps with an explanatory "note"). If the child hangs
  in C code (chip re-acquired between probe and init), the parent kills it
  at deadline+grace and prints the failure JSON itself.
- Auto-shrink instead of overrun: both arms time as many update reps as
  fit their share of the remaining budget (>=1 each). The naive arm's
  jitted functions are PRE-compiled with correctly-shaped dummy calls, so
  even a single timed naive rep is clean (no compile time inflating the
  denominator, which would dishonestly inflate the ratio).

The naive baseline is re-measured LIVE on every run (median of the timed
reps) so vs_baseline is a real same-chip A/B each round and robust to
tunnel-latency spikes (a single-update naive timing swung 26.8..91.8 fps
between same-day runs in round 2). Set BENCH_FAST=1 to skip the naive
re-measurement and divide by the recorded 62.5 fps instead.

The host-env overlap follows the config default (OFF — measured ~25%
slower on this tunneled chip, results/overlap_ab.log); BENCH_OVERLAP=1
re-enables it for co-located-host measurements.

Env knobs: BENCH_TOTAL_S (whole-run wall budget, default 1380),
BENCH_UPDATES (max timed optimized updates, default 3),
BENCH_NAIVE_UPDATES (max timed naive updates, default 3), BENCH_NUM_ENVS,
BENCH_NUM_STEP, BENCH_FAST=1 (recorded baseline, no live naive),
BENCH_NAIVE_FPS (override the baseline), BENCH_OVERLAP=1 (enable the
double-buffered host-env/device overlap), BENCH_DEVICE_ENV=1 (zero-host
scan-rollout pipeline), BENCH_SHARED=0 (exact stacked dual-token optimized
arm instead of the shipped fused dual-query default), BENCH_ATTN_IMPL /
BENCH_FFN (kernel selection). Arm-definition changes vs earlier rounds are
tabulated in BASELINE.md ("bench arm definitions") — cross-round
vs_baseline comparisons are NOT meaningful, only same-session ratios are.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

T0 = time.time()
TOTAL_S = float(os.environ.get("BENCH_TOTAL_S", 1380))
METRIC = "env_frames_per_sec_per_chip (rollout+update, Montezuma-scale RND-ViT)"
# recorded naive (reference-style) measurement at the flagship scale on this
# chip (BASELINE.md round 1); used by BENCH_FAST and the deadline fallback
RECORDED_NAIVE_FPS = 62.5

if "BENCH_NO_OVERLAP" in os.environ:
    print(
        "# WARNING: BENCH_NO_OVERLAP was retired in round 3 (overlap is OFF "
        "by default now); use BENCH_OVERLAP=1 to enable overlap",
        file=sys.stderr, flush=True,
    )


def _result_line(value, vs_baseline, note=None, error=None) -> str:
    rec = {
        "metric": METRIC,
        "value": round(value, 1) if value is not None else None,
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
    }
    if note:
        rec["note"] = note
    if error:
        rec["error"] = error
    return json.dumps(rec)


# ===========================================================================
# Parent: stdlib-only supervisor. Probes the chip with subprocess timeouts,
# then runs the measurement in a child bounded by the one wall-clock budget.
# NEVER imports jax (axon backend init blocks indefinitely while another
# process holds the tunneled chip — BENCH_r03 post-mortem, VERDICT r3).
# ===========================================================================

def _parent_main() -> int:
    deadline_total = T0 + TOTAL_S
    # reserve the lion's share of the budget for the measurement itself
    meas_reserve = min(840.0, 0.65 * TOTAL_S)
    probe_deadline = deadline_total - meas_reserve

    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        attempt, ok = 0, False
        while time.time() < probe_deadline:
            attempt += 1
            try:
                subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    timeout=min(120, max(20, probe_deadline - time.time())),
                    check=True,
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                )
                ok = True
                break
            except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
                print(
                    f"# chip probe {attempt} failed (chip held or tunnel "
                    f"down); {probe_deadline - time.time():.0f}s of probe "
                    "budget left", file=sys.stderr, flush=True,
                )
                time.sleep(max(0.0, min(40.0, probe_deadline - time.time())))
        if not ok:
            # clean, parseable failure within seconds — never proceed into
            # a backend init that is known to hang (VERDICT r3 item 1a)
            print(
                _result_line(
                    None, None,
                    error=(
                        f"chip unavailable after {time.time() - T0:.0f}s of "
                        f"probing ({attempt} probes); measurement skipped"
                    ),
                )
            )
            sys.stdout.flush()
            return 1

    # child deadline: leave the parent a grace window to kill + report
    child_deadline = deadline_total - 40.0
    env = dict(os.environ)
    env["BENCH_CHILD"] = "1"
    env["BENCH_DEADLINE"] = repr(child_deadline)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, text=True,
    )
    saw_json = [False]

    def _tee() -> None:
        assert proc.stdout is not None
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            if line.lstrip().startswith("{") and '"metric"' in line:
                saw_json[0] = True

    t = threading.Thread(target=_tee, daemon=True)
    t.start()
    try:
        rc = proc.wait(timeout=max(5.0, deadline_total - 15.0 - time.time()))
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        rc = None
    t.join(timeout=5)
    if not saw_json[0]:
        print(
            _result_line(
                None, None,
                error=(
                    "measurement child "
                    + ("timed out (killed)" if rc is None else f"died rc={rc}")
                    + " before emitting a result"
                ),
            )
        )
        sys.stdout.flush()
        return 1
    return rc if rc is not None else 1


if __name__ == "__main__" and os.environ.get("BENCH_CHILD") != "1":
    sys.exit(_parent_main())


# ===========================================================================
# Child: the actual measurement. Emits exactly one JSON line — at natural
# completion, or from the deadline watchdog with the best partial result.
# ===========================================================================

DEADLINE = float(os.environ.get("BENCH_DEADLINE", T0 + TOTAL_S - 40.0))

_partial = {"value": None, "vs_baseline": None, "note": None, "error": None}
_emit_lock = threading.Lock()
_emitted = [False]


def _emit_once() -> None:
    with _emit_lock:
        if _emitted[0]:
            return
        _emitted[0] = True
        print(
            _result_line(
                _partial["value"], _partial["vs_baseline"],
                note=_partial["note"], error=_partial["error"],
            )
        )
        sys.stdout.flush()


def _watchdog() -> None:
    while True:
        left = DEADLINE - time.time()
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    if _emitted[0]:
        return
    if _partial["value"] is not None and _partial["vs_baseline"] is None:
        if (NUM_ENVS, NUM_STEP) == (64, 128):
            _partial["vs_baseline"] = _partial["value"] / RECORDED_NAIVE_FPS
            prior = f" [{_partial['note']}]" if _partial["note"] else ""
            _partial["note"] = (
                "deadline fallback: naive arm did not finish; vs_baseline "
                f"uses the recorded {RECORDED_NAIVE_FPS} fps naive "
                "measurement (BASELINE.md), not a same-session A/B" + prior
            )
        else:
            # the recorded naive fps is a 64x128 flagship measurement; a
            # cross-scale ratio would be meaningless (review r4)
            _partial["note"] = (
                "deadline fallback: naive arm did not finish and the "
                f"recorded naive baseline is 64x128-only (this run is "
                f"{NUM_ENVS}x{NUM_STEP}); vs_baseline omitted"
            )
    elif _partial["value"] is None:
        _partial["error"] = "deadline hit before the optimized arm finished"
    _emit_once()
    os._exit(0 if _partial["value"] is not None else 1)


threading.Thread(target=_watchdog, daemon=True).start()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eavit_tpu.config import Config, TrainMethod  # noqa: E402
from eavit_tpu.envs.synthetic import SyntheticVectorEnv  # noqa: E402
from eavit_tpu.rl.agent import RNDAgent, Rollout  # noqa: E402
from eavit_tpu.rl.rollout import RolloutCollector  # noqa: E402

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 64))
NUM_STEP = int(os.environ.get("BENCH_NUM_STEP", 128))
UPDATES = int(os.environ.get("BENCH_UPDATES", 3))
NAIVE_UPDATES = int(os.environ.get("BENCH_NAIVE_UPDATES", 3))


def flagship_cfg(**kw) -> Config:
    base = dict(
        train_method=TrainMethod.ORIGINAL_RND,
        num_step=NUM_STEP,
        num_env_per_process=NUM_ENVS,
        epoch=4,
        mini_batch=32,
        obs_norm_step=0,  # warm-up excluded from throughput measurement
        max_step_per_episode=4500,
        # default: the SHIPPED flagship configuration — fused dual-query
        # SharedPatchStream (learning-equivalent on the maze A/B,
        # BASELINE.md round 2) + fused FFN, exactly what the flagship
        # .confs default to since round 3. BENCH_SHARED=0 measures the
        # exact stacked dual-token mode (semantics-matched to the
        # reference's two-pass math) as the conservative row.
        shared_patch_stream=os.environ.get("BENCH_SHARED", "1") == "1",
        # Overlap follows the config default (OFF): the double-buffered
        # half-fleet rollout measured ~25% SLOWER on this tunneled chip
        # (results/overlap_ab.log: ~330 on vs ~430 off). BENCH_OVERLAP=1
        # re-enables it for co-located-host measurements.
        async_env_pool=os.environ.get("BENCH_OVERLAP") == "1",
        # training-path kernels (round 3): fused in-kernel-dropout flash
        # attention (ops/flash_dropout) and fused FFN (ops/fused_ffn).
        # Measured on v5e (logs/update_bench_drop.out): fused FFN wins
        # (+2.1% exact, +3.6% shared update throughput) -> default ON;
        # attention kernel selection via BENCH_ATTN_IMPL. Default matches
        # the flagship confs since round 4: the boundary-free fused qkv
        # flash kernel (verified 24/24 on-chip, logs/kernel_check_qkv2.out;
        # exact 9.23->6.68 s/update, shared 4.47->3.23). Set
        # BENCH_ATTN_IMPL=xla to measure the round-3 arm definition.
        attention_impl=os.environ.get("BENCH_ATTN_IMPL", "pallas_qkv"),
        fused_ffn=os.environ.get("BENCH_FFN", "1") == "1",
    )
    base.update(kw)
    return Config(**base)


class PreparedArm:
    """One bench arm, built AND precompiled, ready to time.

    Round-5 restructure (VERDICT r4 weak #4): both arms' compiles happen
    in a prepare phase BEFORE the remaining wall budget is split into
    per-arm measurement deadlines, so a 50 s naive compile can no longer
    eat timed-rep budget and leave an arm with a median-of-1.
    """

    def __init__(self, cfg: Config, naive: bool):
        self.cfg, self.naive = cfg, naive
        self.name = "naive" if naive else "optimized"
        if not naive:
            from eavit_tpu.train import setup_jax

            setup_jax(cfg)
        self.env = SyntheticVectorEnv(
            cfg.num_env_per_process, seed=42,
            max_episode_steps=cfg.max_step_per_episode,
        )
        agent = RNDAgent(cfg, self.env.action_space_n)
        self.agent = agent
        rng = jax.random.PRNGKey(0)
        rng, k = jax.random.split(rng)
        self.rng = rng
        state = agent.init_state(k)
        if naive:
            # the reference ships full stacked frames per step (envs.py:153)
            self.collector = RolloutCollector(cfg, agent, self.env)
        else:
            from eavit_tpu.rl.device_rollout import DeviceRolloutCollector

            self.collector = DeviceRolloutCollector(cfg, agent, self.env)
        self.states = self.env.reset()
        # seed obs_rms so normalization is realistic
        self.state = agent.update_obs_rms(
            state, jnp.asarray(self.collector._next_obs_of(self.states))
        )

    def one_update(self, rng) -> None:
        k1, k2 = jax.random.split(rng)
        rollout, self.states = self.collector.collect(
            self.state.params, self.states, k1
        )
        if self.naive:
            self.state = naive_update(
                self.agent, self.cfg, self.state, rollout, k2
            )
            # force completion: fetch a value (block_until_ready is
            # unreliable on the tunneled TPU backend)
            float(jnp.sum(jax.tree_util.tree_leaves(self.state.params)[0]))
        else:
            self.state, metrics = self.agent.update(self.state, rollout, k2)
            float(metrics["train/loss"])

    def precompile(self) -> None:
        t0 = time.time()
        if self.naive:
            # PRE-compile every jitted function on the naive path with
            # correctly-shaped dummy calls so the FIRST timed rep is
            # already clean. (Timing a compile-inclusive rep would inflate
            # the naive denominator and thus dishonestly inflate
            # vs_baseline.)
            _precompile_naive(
                self.agent, self.cfg, self.state, self.collector, self.states
            )
        else:
            # warm-up update (compile)
            self.rng, k = jax.random.split(self.rng)
            self.one_update(k)
        print(
            f"# {self.name}: prepared+compiled in {time.time() - t0:.0f}s",
            file=sys.stderr, flush=True,
        )

    def time_reps(self, n_timed: int, arm_deadline: float) -> float:
        """Time up to ``n_timed`` update reps, stopping early at the arm
        deadline (always >=1 rep); returns frames/s from the median."""
        cfg = self.cfg
        frames = cfg.num_step * cfg.num_env_per_process
        # median of per-update times: robust to one-off tunnel-latency
        # spikes (round 2's single-update naive timing swung 3.4x between
        # runs)
        times: list[float] = []
        for _ in range(n_timed):
            t0 = time.perf_counter()
            self.rng, k = jax.random.split(self.rng)
            self.one_update(k)
            times.append(time.perf_counter() - t0)
            # auto-shrink: stop adding reps when the next one would run
            # past this arm's share of the wall budget (keep >=1 rep)
            if time.time() + 1.15 * max(times) > arm_deadline:
                if len(times) < n_timed:
                    print(
                        f"# {self.name}: budget stop after "
                        f"{len(times)} rep(s)",
                        file=sys.stderr, flush=True,
                    )
                break
        print(
            f"# {self.name}: {len(times)} timed rep(s), median "
            f"{float(np.median(times)):.2f}s",
            file=sys.stderr, flush=True,
        )
        return frames / float(np.median(times))


# ---------------------------------------------------------------------------
# Naive reference-style pipeline: host-driven minibatch loop, f32, separate
# device call per minibatch with per-batch H2D (agents.py:275-301 semantics).
# ---------------------------------------------------------------------------


def _naive_data_shapes(cfg: Config, collector, states) -> dict:
    """Zero-filled device arrays with the exact shapes/dtypes naive_update
    feeds to the per-minibatch jitted step (for pre-compilation)."""
    T, N = cfg.num_step, cfg.num_env_per_process
    num = T * N
    obs_shape = states.shape[1:]
    next_obs_shape = collector._next_obs_of(states).shape[1:]
    n_act = collector.agent.output_size
    return {
        "s": jnp.zeros((num,) + obs_shape, jnp.uint8),
        "y": jnp.zeros((num,), jnp.int32),
        "old_policy": jnp.zeros((num, n_act), jnp.float32),
        "adv": jnp.zeros((num,), jnp.float32),
        "ext_target": jnp.zeros((num,), jnp.float32),
        "int_target": jnp.zeros((num,), jnp.float32),
        "rnd_in": jnp.zeros((num,) + next_obs_shape, jnp.float32),
    }


def _precompile_naive(agent, cfg: Config, state, collector, states) -> None:
    t0 = time.time()
    k = jax.random.PRNGKey(7)
    # rollout-path jits: act (per env step), intrinsic (per step column)
    a, *_ = agent.act(state.params, jnp.asarray(states), k)
    jax.block_until_ready(a)
    r = agent._intrinsic(
        state.params, state.rnd_target, state.obs_rms,
        jnp.asarray(collector._next_obs_of(states)),
    )
    jax.block_until_ready(r)
    # update-path jit: the per-minibatch SGD step on a zero batch (results
    # discarded; only the compile matters)
    step = _get_naive_step(agent, cfg, state)
    data = _naive_data_shapes(cfg, collector, states)
    batch = (cfg.num_step * cfg.num_env_per_process) // cfg.mini_batch
    p, _ = step(state.params, state.opt_state, data, jnp.arange(batch), k)
    jax.block_until_ready(jax.tree_util.tree_leaves(p)[0])
    # eager-path traces naive_update also pays on first call (review r4):
    # the reward-filter lax.scan, BOTH make_train_data dtype variants
    # (bool ext dones vs f32 zero int dones), and the obs-RMS batch reduce.
    from eavit_tpu.rl import normalizer as norm
    from eavit_tpu.ops.gae import make_train_data
    T, N = cfg.num_step, cfg.num_env_per_process
    ti = jnp.zeros((N, T), r.dtype)
    nf, per = norm.reward_filter_scan(state.reward_filter, ti, cfg.int_gamma)
    rr = norm.rms_update_from_moments(
        state.reward_rms, np.float32(0.0), np.float32(1.0), per.shape[0]
    )
    jax.block_until_ready(rr.var)
    vals = jnp.zeros((N, T + 1), jnp.float32)
    tgt, adv = make_train_data(
        jnp.zeros((N, T), jnp.float32), jnp.zeros((N, T), bool), vals,
        cfg.gamma, cfg.gae_lambda, cfg.use_gae,
    )
    tgt2, adv2 = make_train_data(
        jnp.zeros((N, T), jnp.float32), jnp.zeros((N, T), jnp.float32), vals,
        cfg.int_gamma, cfg.gae_lambda, cfg.use_gae,
    )
    jax.block_until_ready((adv, adv2))
    obs1 = np.asarray(collector._next_obs_of(states))
    flat = jnp.zeros((T * N,) + obs1.shape[1:], jnp.float32)
    orms = norm.rms_update(state.obs_rms, flat)
    jax.block_until_ready(orms.var)
    print(
        f"# naive: precompiled in {time.time() - t0:.0f}s",
        file=sys.stderr, flush=True,
    )


def _get_naive_step(agent: RNDAgent, cfg: Config, state):
    if hasattr(agent, "_naive_step"):
        return agent._naive_step
    import optax

    def mb_step(params, opt_state, data, idx, key):
        batch = {k: v[idx] for k, v in data.items()}
        batch["s"] = batch["s"].astype(jnp.float32) / 255.0

        def loss_fn(params):
            loss, aux = agent_loss(params, batch, key)
            return loss

        # reuse the agent's loss via a minimal closure
        def agent_loss(params, batch, key):
            from eavit_tpu.rl.ppo import (
                categorical_entropy,
                categorical_log_prob,
                ppo_surrogate,
            )
            from eavit_tpu.models.rnd import rnd_loss as rnd_loss_fn

            k_drop, k_noise, k_mask = jax.random.split(key, 3)
            out = agent.network.apply(
                {"params": params["policy"]},
                batch["s"],
                False,
                rngs={"dropout": k_drop, "noise": k_noise},
            )
            log_prob = categorical_log_prob(out.policy, batch["y"])
            log_prob_old = categorical_log_prob(batch["old_policy"], batch["y"])
            ppo = ppo_surrogate(
                log_prob, log_prob_old, batch["adv"], out.value_ext,
                batch["ext_target"], categorical_entropy(out.policy),
                cfg.ppo_eps, out.value_int, batch["int_target"],
            )
            t = agent.rnd_target_net.apply({"params": state.rnd_target}, batch["rnd_in"])
            p = agent.rnd_pred.apply({"params": params["rnd_pred"]}, batch["rnd_in"])
            mask_u = jax.random.uniform(k_mask, (batch["rnd_in"].shape[0],))
            rl = rnd_loss_fn(t, p, mask_u, cfg.update_proportion)
            loss = (
                ppo.actor_loss
                + 0.5 * (ppo.critic_ext_loss + ppo.critic_int_loss)
                - cfg.entropy_coef * ppo.entropy
                + rl
            )
            return loss, None

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = agent.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    agent._naive_step = jax.jit(mb_step)
    return agent._naive_step


def naive_update(agent: RNDAgent, cfg: Config, state, ro: Rollout, rng):
    T, N = ro.rewards.shape
    num_samples = T * N
    batch_size = num_samples // cfg.mini_batch

    # per-step intrinsic reward device calls (reference computes one per
    # env step, train.py:662-673)
    int_rows = []
    for t in range(T):
        int_rows.append(
            np.asarray(
                agent._intrinsic(
                    state.params, state.rnd_target, state.obs_rms, ro.next_obs[t]
                )
            )
        )
    total_int_reward = np.stack(int_rows, axis=1)  # [N, T]

    from eavit_tpu.rl import normalizer as norm
    from eavit_tpu.ops.gae import make_train_data

    new_filter, per_step = norm.reward_filter_scan(
        state.reward_filter, jnp.asarray(total_int_reward), cfg.int_gamma
    )
    flat = np.asarray(per_step).reshape(-1)
    reward_rms = norm.rms_update_from_moments(
        state.reward_rms, flat.mean(), flat.var(), per_step.shape[0]
    )
    total_int_reward = total_int_reward / np.sqrt(float(reward_rms.var))

    total_reward = np.clip(np.asarray(ro.rewards).T, -1, 1)
    total_done = np.asarray(ro.dones).T
    ext_target, ext_adv = make_train_data(
        jnp.asarray(total_reward), jnp.asarray(total_done),
        jnp.asarray(ro.value_ext).T, cfg.gamma, cfg.gae_lambda, cfg.use_gae,
    )
    int_target, int_adv = make_train_data(
        jnp.asarray(total_int_reward), jnp.zeros((N, T)),
        jnp.asarray(ro.value_int).T, cfg.int_gamma, cfg.gae_lambda, cfg.use_gae,
    )
    total_adv = (
        np.asarray(int_adv) * cfg.int_coef + np.asarray(ext_adv) * cfg.ext_coef
    ).reshape(-1)

    def env_major(x):
        x = np.asarray(x)
        return np.swapaxes(x, 0, 1).reshape((num_samples,) + x.shape[2:])

    next_obs_flat = env_major(ro.next_obs).astype(np.float32)
    obs_rms = norm.rms_update(state.obs_rms, jnp.asarray(next_obs_flat))
    mean = np.asarray(obs_rms.mean)
    std = np.sqrt(np.asarray(obs_rms.var))
    rnd_in = np.clip((next_obs_flat - mean) / std, -5, 5).astype(np.float32)

    # Arrays live on device; each minibatch is a SEPARATE dispatch with an
    # on-device gather (torch-eager execution model without punishing the
    # baseline for this container's slow host<->device tunnel).
    s_all = jnp.swapaxes(ro.states, 0, 1).reshape((num_samples,) + ro.states.shape[2:])
    y_all = jnp.swapaxes(ro.actions, 0, 1).reshape(num_samples)
    pol_all = jnp.swapaxes(ro.policy, 0, 1).reshape((num_samples,) + ro.policy.shape[2:])
    ext_t = jnp.asarray(np.asarray(ext_target).reshape(-1))
    int_t = jnp.asarray(np.asarray(int_target).reshape(-1))
    rnd_in_dev = jnp.asarray(rnd_in)

    data = {
        "s": s_all,
        "y": y_all,
        "old_policy": pol_all,
        "adv": jnp.asarray(total_adv),
        "ext_target": ext_t,
        "int_target": int_t,
        "rnd_in": rnd_in_dev,
    }

    step = _get_naive_step(agent, cfg, state)
    params, opt_state = state.params, state.opt_state
    rng_np = np.random.default_rng(1234)
    for _ in range(cfg.epoch):
        perm = rng_np.permutation(num_samples)
        for j in range(cfg.mini_batch):
            idx = jnp.asarray(perm[j * batch_size : (j + 1) * batch_size])
            rng, k = jax.random.split(rng)
            params, opt_state = step(params, opt_state, data, idx, k)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    return state._replace(
        params=params,
        opt_state=opt_state,
        obs_rms=obs_rms,
        reward_rms=reward_rms,
        reward_filter=new_filter,
        global_update=state.global_update + 1,
    )


def run_device_env_pipeline(cfg: Config) -> float:
    """Zero-host pipeline: jittable env + whole-rollout-in-one-scan."""
    from eavit_tpu.envs.device_env import make_device_env
    from eavit_tpu.rl.scan_rollout import ScanRolloutCollector
    from eavit_tpu.train import setup_jax

    setup_jax(cfg)
    env_params, env_state = make_device_env(
        cfg.num_env_per_process, seed=42, max_episode_steps=cfg.max_step_per_episode
    )
    agent = RNDAgent(cfg, 5)
    rng = jax.random.PRNGKey(0)
    rng, k = jax.random.split(rng)
    state = agent.init_state(k)
    col = ScanRolloutCollector(cfg, agent, env_params)
    rng, k1, k2 = jax.random.split(rng, 3)
    ro, env_state, _ = col.collect(state.params, env_state, k1)
    state = agent.update_obs_rms(
        state, jnp.reshape(ro.next_obs, (-1,) + ro.next_obs.shape[2:])
    )
    state, m = agent.update(state, ro, k2)
    float(m["train/loss"])
    frames = cfg.num_step * cfg.num_env_per_process
    t0 = time.perf_counter()
    for _ in range(UPDATES):
        rng, k1, k2 = jax.random.split(rng, 3)
        ro, env_state, _ = col.collect(state.params, env_state, k1)
        state, m = agent.update(state, ro, k2)
        float(m["train/loss"])
    return frames * UPDATES / (time.perf_counter() - t0)


def main() -> None:
    if os.environ.get("BENCH_DEVICE_ENV") == "1":
        fps = run_device_env_pipeline(flagship_cfg())
        _partial["value"] = fps
        if (NUM_ENVS, NUM_STEP) == (64, 128):
            _partial["vs_baseline"] = fps / RECORDED_NAIVE_FPS
            _partial["note"] = (
                "zero-host device-env pipeline; vs_baseline uses the "
                f"recorded {RECORDED_NAIVE_FPS} fps naive measurement"
            )
        else:
            _partial["note"] = (
                "zero-host device-env pipeline; recorded naive baseline is "
                f"64x128-only (this run is {NUM_ENVS}x{NUM_STEP}); "
                "vs_baseline omitted"
            )
        _emit_once()
        return

    live_naive = os.environ.get("BENCH_FAST") != "1"

    # ---- prepare phase: build + compile BOTH arms before any timing, so
    # compiles never eat timed-rep budget (VERDICT r4 weak #4)
    opt_arm = PreparedArm(flagship_cfg(), naive=False)
    opt_arm.precompile()
    # Provisional result BEFORE the naive prepare: one timed optimized rep,
    # so a deadline hit during the naive arm's (long) compile degrades to a
    # parseable value + recorded-baseline fallback instead of a null (the
    # failure mode the shortened r5 preview exposed: prepare-phase deadline
    # -> "deadline hit before the optimized arm finished").
    t0 = time.perf_counter()
    opt_arm.rng, _k = jax.random.split(opt_arm.rng)
    opt_arm.one_update(_k)
    _partial["value"] = (
        opt_arm.cfg.num_step * opt_arm.cfg.num_env_per_process
    ) / (time.perf_counter() - t0)
    _partial["note"] = "provisional single-rep optimized timing"
    naive_arm = None
    if live_naive:
        naive_cfg = flagship_cfg(
            compute_dtype="float32", use_pallas_attention=False,
            shared_patch_stream=False, attention_impl="", fused_ffn=False,
        )
        naive_arm = PreparedArm(naive_cfg, naive=True)
        naive_arm.precompile()

    # ---- measurement phase: split what is LEFT between the arms.
    # Optimized gets ~40% (cheap, predictable reps); naive the rest.
    now = time.time()
    remaining = DEADLINE - 20.0 - now
    opt_deadline = now + (0.4 * remaining if live_naive else remaining)
    fps_opt = opt_arm.time_reps(UPDATES, opt_deadline)
    _partial["value"] = fps_opt
    _partial["note"] = None  # real median supersedes the provisional rep
    print(f"# optimized: {fps_opt:.1f} frames/s", file=sys.stderr, flush=True)

    if not live_naive:
        # recorded measurement of the reference-style pipeline on this chip
        # (see module docstring); flagship scale only
        default_naive = (
            RECORDED_NAIVE_FPS if (NUM_ENVS, NUM_STEP) == (64, 128) else 0.0
        )
        fps_naive = float(os.environ.get("BENCH_NAIVE_FPS", default_naive)) or None
        if fps_naive:
            _partial["note"] = (
                f"BENCH_FAST: vs_baseline uses the recorded {fps_naive} fps "
                "naive measurement, not a same-session A/B"
            )
    else:
        # live same-chip A/B every run (the recorded constant would age
        # silently as the framework and the tunnel change)
        fps_naive = naive_arm.time_reps(NAIVE_UPDATES, DEADLINE - 20.0)
        print(
            f"# naive(reference-style): {fps_naive:.1f} frames/s",
            file=sys.stderr, flush=True,
        )

    _partial["vs_baseline"] = (fps_opt / fps_naive) if fps_naive else None
    _emit_once()


if __name__ == "__main__":
    main()
