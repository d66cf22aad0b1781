# round-4: seed-7 replication of the middle-regime sparse-goal A/B
# (same regime as 50_sparse_ab; a different maze AND different init).
# Confirms the depth-24/4-variant RND win is not a seed-42 accident.
# 700 updates/arm: both arms' seed-42 solves happened by update ~40, and
# the round-end chip handoff needs the queue drained by ~12:45 UTC.
cd /root/repo
timeout 3300 python scripts/maze_ab.py --arm rnd --updates 700 --seed 7 \
  --sparse --goal_depth 24 --ep_len 256 --variants 4 --grid 8 --num_envs 32 \
  --shared --int_coef 10 --ext_coef 2 --int_decay 1000 \
  --tag _g8d24v4ic10ext2dk1000shared --out_dir results/maze_ab
timeout 3300 python scripts/maze_ab.py --arm ppo --updates 700 --seed 7 \
  --sparse --goal_depth 24 --ep_len 256 --variants 4 --grid 8 --num_envs 32 \
  --shared --ext_coef 2 \
  --tag _g8d24v4ext2shared --out_dir results/maze_ab
tail -2 results/maze_ab/rnd_g8d24v4ic10ext2dk1000shared_seed7.jsonl
tail -2 results/maze_ab/ppo_g8d24v4ext2shared_seed7.jsonl
