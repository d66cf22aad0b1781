# round-4: HARD-regime sparse-goal A/B. The depth-24 regime (job 50) was
# solved by BOTH arms (RND by update ~18, extrinsic-only PPO by ~40 — a
# 2.2x sample-efficiency win but not a capability gap). This regime —
# grid 10, goal at BFS depth 28, 4 variants, ep_len 256 — has a calibrated
# uniform-policy encounter rate of 0.092 hits per 32x128 rollout (0.57% of
# episodes; scripts/sparse_calibrate.py), 4.4x rarer than depth-24: PPO's
# minibatches almost never contain goal reward before the policy commits,
# while RND's novelty pressure still drives deep visitation. This is the
# reference's actual Montezuma claim shape: RND solves what PPO cannot.
cd /root/repo
timeout 7200 python scripts/maze_ab.py --arm rnd --updates 1500 --seed 42 \
  --sparse --goal_depth 28 --ep_len 256 --variants 4 --grid 10 --num_envs 32 \
  --shared --int_coef 10 --ext_coef 2 --int_decay 1000 \
  --tag _g10d28v4ic10ext2dk1000shared --out_dir results/maze_ab
timeout 7200 python scripts/maze_ab.py --arm ppo --updates 1500 --seed 42 \
  --sparse --goal_depth 28 --ep_len 256 --variants 4 --grid 10 --num_envs 32 \
  --shared --ext_coef 2 \
  --tag _g10d28v4ext2shared --out_dir results/maze_ab
tail -2 results/maze_ab/rnd_g10d28v4ic10ext2dk1000shared_seed42.jsonl
tail -2 results/maze_ab/ppo_g10d28v4ext2shared_seed42.jsonl
