# round-4: seed-7 replication of the HARD sparse regime (grid 10, depth 28)
# — the regime where the RND-vs-PPO gap is large (seed 42: RND solves at
# upd 42 vs PPO 110). The depth-24 seed-7 replication came out a near-tie
# (RND 23 vs PPO 25): at 0.41 uniform hits/rollout PPO can luck into the
# goal, so the capability claim rests on the 4.4x-sparser regime and needs
# its own seed replication. 250 updates/arm: 6x RND's seed-42 solve point,
# 2.3x PPO's; arms that haven't solved by then are reported as such.
cd /root/repo
timeout 1500 python scripts/maze_ab.py --arm rnd --updates 250 --seed 7 \
  --sparse --goal_depth 28 --ep_len 256 --variants 4 --grid 10 --num_envs 32 \
  --shared --int_coef 10 --ext_coef 2 --int_decay 1000 \
  --tag _g10d28v4ic10ext2dk1000shared --out_dir results/maze_ab
timeout 1500 python scripts/maze_ab.py --arm ppo --updates 250 --seed 7 \
  --sparse --goal_depth 28 --ep_len 256 --variants 4 --grid 10 --num_envs 32 \
  --shared --ext_coef 2 \
  --tag _g10d28v4ext2shared --out_dir results/maze_ab
tail -1 results/maze_ab/rnd_g10d28v4ic10ext2dk1000shared_seed7.jsonl
tail -1 results/maze_ab/ppo_g10d28v4ext2shared_seed7.jsonl
