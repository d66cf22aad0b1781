# round-5: seeds 3,5,11,19,27 of the HARD sparse regime A/B.
# Goal: grow the paired solve-point sample from 5 to 10 seeds so the
# RND-solves-faster claim clears a standard significance bar (sign test +
# Wilcoxon signed-rank, see scripts/maze_ab_report.py). Same regime as
# rounds 3-4: grid 10, goal at BFS depth 28, 4 variants, 32 envs, shared
# patch stream, int_coef 10 decayed over 1000 updates vs ext-only PPO.
cd /root/repo
for SEED in 3 5 11 19 27; do
timeout 2400 python scripts/maze_ab.py --arm rnd --updates 250 --seed $SEED \
  --sparse --goal_depth 28 --ep_len 256 --variants 4 --grid 10 --num_envs 32 \
  --shared --int_coef 10 --ext_coef 2 --int_decay 1000 \
  --tag _g10d28v4ic10ext2dk1000shared --out_dir results/maze_ab
timeout 2400 python scripts/maze_ab.py --arm ppo --updates 250 --seed $SEED \
  --sparse --goal_depth 28 --ep_len 256 --variants 4 --grid 10 --num_envs 32 \
  --shared --ext_coef 2 \
  --tag _g10d28v4ext2shared --out_dir results/maze_ab
done
