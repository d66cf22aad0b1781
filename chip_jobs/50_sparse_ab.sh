# VERDICT r3 item 2: middle-regime sparse-goal A/B — convert the round-3
# null into a demonstrated RND win. Regime chosen by CPU random-walk
# calibration on the exact seed-42 8x8 maze (scripts/sparse_calibrate.py):
# goal at BFS depth 24 (round 3: 46), ep_len 256, 4 frame variants/room
# (novelty decays with visitation count instead of dying at update ~35) —
# uniform-policy encounter rate 0.41 hits/rollout (round 3: ~0.05, which
# was unlearnable). RND arm anneals int_coef 10 -> 0 over 1000 updates so
# the extrinsic gradient takes over once exploration surfaces the goal.
# 1500 updates x 32 envs x 128 steps = 6.1M frames per arm, matched.
cd /root/repo
timeout 10000 python scripts/maze_ab.py --arm rnd --updates 1500 --seed 42 \
  --sparse --goal_depth 24 --ep_len 256 --variants 4 --grid 8 --num_envs 32 \
  --shared --int_coef 10 --ext_coef 2 --int_decay 1000 \
  --tag _g8d24v4ic10ext2dk1000shared --out_dir results/maze_ab
timeout 10000 python scripts/maze_ab.py --arm ppo --updates 1500 --seed 42 \
  --sparse --goal_depth 24 --ep_len 256 --variants 4 --grid 8 --num_envs 32 \
  --shared --ext_coef 2 \
  --tag _g8d24v4ext2shared --out_dir results/maze_ab
tail -2 results/maze_ab/rnd_g8d24v4ic10ext2dk1000shared_seed42.jsonl
tail -2 results/maze_ab/ppo_g8d24v4ext2shared_seed42.jsonl
