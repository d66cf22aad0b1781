"""Long-horizon reward-free exploration A/B on the DFS-maze device env.

The headline capability claim of the reference (README.md:41-58): RND
intrinsic rewards drive exploration beyond a random-walk baseline. Round-1
evidence was a torus A/B (random-walk-friendly, weak) and an inconclusive
14-update maze run; this script runs the queued long-horizon version:

  arm "rnd":  TrainMethod=original_RND, ExtCoef=0, IntCoef=1 (pure intrinsic)
  arm "ppo":  TrainMethod=PPO, ExtCoef=0 (zero advantage -> entropy keeps the
              policy near-uniform: the learned-random-walk control)

Both arms: 32 envs on per-env 12x12 DFS spanning-tree mazes (144 rooms,
walls block all non-corridor moves, no torus wrap), noise-textured rooms,
384-step episodes, flagship dual-token ViT (dim 256 / depth 3 / heads 8 /
patch 6), lr 3e-4 (both arms identically). Metric: mean rooms visited per
finished episode. Per-update JSONL curves go to logs/maze_ab/<arm>.jsonl.

Env-design rationale (measured, attempts 1-2, 2026-08-16):

- 8x8 grid: only 64 distinct frames per env — the RND predictor memorizes
  the WHOLE observation space in ~30 updates; advantages fall to ~1e-5 and
  the actor never leaves the uniform policy.
- 16x16 sine-textured grid: rooms are a smooth 3-parameter sinusoid family,
  so the predictor GENERALIZES to unseen rooms (~100x frontier/visited
  error ratio after 20 rooms). Frontier novelty too weak at a 2.5M-frame
  budget (the RND paper burns hundreds of millions of frames on Montezuma).
- noise textures make rooms mutually unpredictable (~6000x frontier ratio,
  measured by held-out probe); a 12x12 maze keeps the frontier within
  random-excursion reach of 384-step episodes.

Usage: python scripts/maze_ab.py --arm rnd --updates 300
       python scripts/maze_ab.py --arm ppo --updates 300
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from eavit_tpu.config import Config, TrainMethod
from eavit_tpu.envs.device_env import make_device_env
from eavit_tpu.rl.agent import RNDAgent
from eavit_tpu.rl.scan_rollout import ScanRolloutCollector
from eavit_tpu.train import setup_jax


def make_cfg(arm: str, seed: int, entropy: float = 0.001,
             int_coef: float = 1.0, lr: float = 3e-4,
             maze: bool = True, update_proportion: float = 0.25,
             grid: int = 12, ep_len: int = 384,
             num_envs: int = 32, variants: int = 1,
             ext_coef: float = 0.0, shared: bool = False,
             modified: bool = False, ssl: str = "None",
             hg: bool = False, sparse: bool = False,
             obs_norm: int = 50, goal_depth: int = 0,
             int_decay: int = 0, merge: int = 1) -> Config:
    if arm == "rnd":
        method = (
            TrainMethod.MODIFIED_RND if modified else TrainMethod.ORIGINAL_RND
        )
    else:
        method = TrainMethod.PPO
    kw = {}
    if ssl != "None":
        # joint SSL aux loss inside the PPO update (reference
        # representationLearningMethod matrix, agents.py:357-448)
        from eavit_tpu.config import RepresentationMethod, SSLConfig

        kw["representation_lr_method"] = RepresentationMethod(ssl)
        # projector sizes scaled to the dim-256 backbone (the reference's
        # 4096/8192 defaults are sized for ImageNet-scale encoders)
        kw["ssl"] = SSLConfig(
            byol_projection_hidden_size=512,
            byol_projection_size=128,
            barlow_twins_projection_sizes=(512, 512, 512),
        )
    if hg:
        # reduced HG-flavor backbone (reference vit_hg.py:227-402) at a
        # budget comparable to the lucidrains flagship: same dim/depth
        # family, HF-style encoder semantics (GELU, qkv bias, trunc-normal)
        from eavit_tpu.config import ViTHGConfig, ViTImplementation

        kw["vit_implementation_type"] = ViTImplementation.HG
        kw["vit_hg"] = ViTHGConfig(
            hidden_size=256, num_hidden_layers=3, num_attention_heads=8,
            intermediate_size=1024, patch_size=6,
        )
        kw["extracted_feature_embedding_dim"] = 256
    return Config(
        shared_patch_stream=shared,
        entropy_coef=entropy,
        update_proportion=update_proportion,
        train_method=method,
        ext_coef=ext_coef,
        int_coef=int_coef,
        num_env_per_process=num_envs,
        num_step=128,
        max_step_per_episode=ep_len,
        synthetic_grid=grid,
        synthetic_maze=maze,
        synthetic_variants=variants,
        learning_rate=lr,
        seed=seed,
        obs_norm_step=obs_norm,
        total_updates=-1,
        synthetic_sparse_goal=sparse,
        synthetic_goal_depth=goal_depth,
        int_coef_decay_updates=int_decay,
        minibatch_merge=merge,
        **kw,
    )


def run(arm: str, updates: int, seed: int, out_dir: str,
        entropy: float = 0.001, int_coef: float = 1.0, lr: float = 3e-4,
        tag: str = "", maze: bool = True,
        update_proportion: float = 0.25,
        grid: int = 12, ep_len: int = 384, num_envs: int = 32,
        variants: int = 1, ext_coef: float = 0.0,
        shared: bool = False, modified: bool = False,
        ssl: str = "None", hg: bool = False, sparse: bool = False,
        obs_norm: int = 50, goal_depth: int = 0, int_decay: int = 0,
        merge: int = 1) -> None:
    cfg = make_cfg(arm, seed, entropy=entropy, int_coef=int_coef, lr=lr,
                   maze=maze, update_proportion=update_proportion,
                   grid=grid, ep_len=ep_len, num_envs=num_envs,
                   variants=variants, ext_coef=ext_coef, shared=shared,
                   modified=modified, ssl=ssl, hg=hg, sparse=sparse,
                   obs_norm=obs_norm, goal_depth=goal_depth,
                   int_decay=int_decay, merge=merge)
    setup_jax(cfg)
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{arm}{tag}_seed{seed}.jsonl")

    env_params, env_state = make_device_env(
        cfg.num_env_per_process,
        seed=cfg.seed,
        grid=cfg.synthetic_grid,
        stack=cfg.state_stack_size,
        height=cfg.pre_proc_height,
        width=cfg.pre_proc_width,
        max_episode_steps=cfg.max_step_per_episode,
        maze=cfg.synthetic_maze,
        texture="noise",
        shared_world=True,
        variants=cfg.synthetic_variants,
        sparse_goal=cfg.synthetic_sparse_goal,
        goal_depth=cfg.synthetic_goal_depth,
    )
    agent = RNDAgent(cfg, 5)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, k = jax.random.split(rng)
    state = agent.init_state(k)
    collector = ScanRolloutCollector(cfg, agent, env_params)

    if agent.use_rnd:
        for _ in range(cfg.obs_norm_step):
            rng, k = jax.random.split(rng)
            ro, env_state, _ = collector.collect(state.params, env_state, k)
            flat = jnp.reshape(ro.next_obs, (-1,) + ro.next_obs.shape[2:])
            state = agent.update_obs_rms(state, flat)
        print(f"[{arm}] obs-rms warm-up done ({cfg.obs_norm_step} rollouts)")

    with open(out_path, "a") as f:
        t_start = time.time()
        for update in range(1, updates + 1):
            rng, k1, k2 = jax.random.split(rng, 3)
            rollout, env_state, env_metrics = collector.collect(
                state.params, env_state, k1
            )
            state, metrics = agent.update(state, rollout, k2)
            rooms = float(env_metrics["data/mean_number_of_visited_rooms"])
            discovered = float(
                env_metrics.get("data/total_rooms_discovered", 0.0)
            )
            row = {
                "arm": arm,
                "seed": seed,
                "update": update,
                "rooms_per_episode": rooms,
                "rooms_discovered": discovered,
                "mean_rooms_discovered": float(
                    env_metrics.get("data/mean_rooms_discovered", 0.0)
                ),
                "episodes": float(env_metrics["data/num_episodes"]),
                "return": float(
                    env_metrics["data/mean_undiscounted_episode_return"]
                ),
                "int_reward": float(
                    metrics.get("data/int_reward_per_rollout", 0.0)
                ),
                "entropy": float(metrics["train/entropy"]),
                "repr_loss": float(
                    metrics.get("train/representation_loss", 0.0)
                ),
                # sparse mode: rewards exist ONLY at the goal, so the
                # rollout's raw reward sum counts goal reaches this rollout
                "goal_hits": float(jnp.sum(rollout.rewards)),
                "elapsed_s": round(time.time() - t_start, 1),
            }
            f.write(json.dumps(row) + "\n")
            f.flush()
            if update % 10 == 0 or update == 1:
                print(
                    f"[{arm}] update {update}/{updates} rooms/ep {rooms:.1f} "
                    f"discovered {discovered:.0f} "
                    f"entropy {row['entropy']:.3f} ({row['elapsed_s']:.0f}s)",
                    flush=True,
                )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--arm", choices=["rnd", "ppo"], required=True)
    p.add_argument("--updates", type=int, default=300)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out_dir", type=str, default="logs/maze_ab")
    p.add_argument("--entropy", type=float, default=0.001)
    p.add_argument("--int_coef", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--tag", type=str, default="")
    p.add_argument("--no_maze", action="store_true",
                   help="open torus map (easy-novelty control experiment)")
    p.add_argument("--update_proportion", type=float, default=0.25,
                   help="fraction of samples training the RND predictor "
                        "(reference UpdateProportion; lower = slower "
                        "memorization = longer-lived novelty)")
    p.add_argument("--grid", type=int, default=12,
                   help="maze side length (grid x grid rooms); bigger keeps "
                        "a permanent unexplored frontier")
    p.add_argument("--ep_len", type=int, default=384,
                   help="max steps per episode")
    p.add_argument("--num_envs", type=int, default=32)
    p.add_argument("--variants", type=int, default=1,
                   help="frame variants per room (steps %% V): continual "
                        "Montezuma-like novelty — RND error decays with "
                        "visit count instead of dying on first sight")
    p.add_argument("--modified", action="store_true",
                   help="rnd arm uses modified_RND (MLP predictor/target "
                        "over backbone embeddings) instead of original_RND")
    p.add_argument("--shared", action="store_true",
                   help="shared-patch-stream backbone (SURVEY §5 fused "
                        "dual-query attention, ~2x faster update): used for "
                        "the learning-equivalence check vs exact mode")
    p.add_argument("--ssl", choices=["None", "BYOL", "Barlow-Twins"],
                   default="None",
                   help="joint SSL aux loss in the PPO update (reference "
                        "representationLearningMethod, agents.py:357-448)")
    p.add_argument("--hg", action="store_true",
                   help="HG-flavor backbone (reference vit_hg.py) at a "
                        "reduced dim-256/depth-3 size: the HG e2e "
                        "learning-evidence run")
    p.add_argument("--obs_norm", type=int, default=50,
                   help="obs-rms warm-up rollouts (reference ObsNormStep)")
    p.add_argument("--sparse", action="store_true",
                   help="sparse-goal maze: reward ONLY at the BFS-farthest "
                        "room (terminates the episode) — the Montezuma-"
                        "shaped A/B where ext-only PPO flounders and "
                        "RND+ext must explore to ever see reward")
    p.add_argument("--goal_depth", type=int, default=0,
                   help="sparse-goal BFS depth target (0 = farthest room, "
                        "round-3 semantics). The round-4 middle regime "
                        "places the goal at depth ~20-30 so intrinsic "
                        "exploration can chaperone the policy to it")
    p.add_argument("--int_decay", type=int, default=0,
                   help="anneal int_coef linearly to 0 over N updates "
                        "(0 = constant): lets the extrinsic gradient take "
                        "over once the sparse reward has been surfaced")
    p.add_argument("--merge", type=int, default=1,
                   help="MiniBatchMerge: m minibatches per optimizer step")
    p.add_argument("--ext_coef", type=float, default=0.0,
                   help="extrinsic advantage coefficient; 0 = reward-free "
                        "A/B, 2 = the reference flagship's ext+int vs "
                        "ext-only comparison (IntCoef=1 ExtCoef=2)")
    a = p.parse_args()
    run(a.arm, a.updates, a.seed, a.out_dir,
        entropy=a.entropy, int_coef=a.int_coef, lr=a.lr, tag=a.tag,
        maze=not a.no_maze, update_proportion=a.update_proportion,
        grid=a.grid, ep_len=a.ep_len, num_envs=a.num_envs,
        variants=a.variants, ext_coef=a.ext_coef, shared=a.shared,
        modified=a.modified, ssl=a.ssl, hg=a.hg, sparse=a.sparse,
        obs_norm=a.obs_norm, goal_depth=a.goal_depth,
        int_decay=a.int_decay, merge=a.merge)
