# round-4: THIRD seed (13) of the HARD sparse regime (grid 10, depth 28)
# A/B — seed 42: RND solves @42 vs PPO @110; seed 7: RND @56 vs PPO @103.
# Same protocol; 250 updates/arm.
cd /root/repo
timeout 2400 python scripts/maze_ab.py --arm rnd --updates 250 --seed 13 \
  --sparse --goal_depth 28 --ep_len 256 --variants 4 --grid 10 --num_envs 32 \
  --shared --int_coef 10 --ext_coef 2 --int_decay 1000 \
  --tag _g10d28v4ic10ext2dk1000shared --out_dir results/maze_ab
timeout 2400 python scripts/maze_ab.py --arm ppo --updates 250 --seed 13 \
  --sparse --goal_depth 28 --ep_len 256 --variants 4 --grid 10 --num_envs 32 \
  --shared --ext_coef 2 \
  --tag _g10d28v4ext2shared --out_dir results/maze_ab
tail -1 results/maze_ab/rnd_g10d28v4ic10ext2dk1000shared_seed13.jsonl
tail -1 results/maze_ab/ppo_g10d28v4ext2shared_seed13.jsonl
