# round-5b: pixel-Pendulum retry with the retuned recipe (lr 5e-4,
# gamma 0.9, entropy 0, clip 0.2 — see configs/pendulum_continuous.conf
# comments; the CPU action-target probe showed lr=1e-4 was the v1 run's
# bottleneck, tests/test_continuous.py::test_continuous_ppo_learns).
# 600 updates ~= 1.23M frames; ~13 s/update measured in the v1 run.
cd /root/repo
mkdir -p results/pendulum checkpoints/pendulum_v2
timeout 9600 python -m eavit_tpu --train \
  --config_path configs/pendulum_continuous.conf \
  --num_env_per_process 16 --total_updates 600 --seed 42 \
  --save_model_path checkpoints/pendulum_v2 --log_name pendulum_r5v2
python scripts/pendulum_curve.py logs/pendulum_r5v2_rank0.log \
  results/pendulum/curve_v2_seed42.jsonl
BEST=checkpoints/pendulum_v2/pendulum_r5v2__BestModelForMeanUndiscountedEpisodeReturn
[ -f "$BEST.msgpack" ] || BEST=checkpoints/pendulum_v2/pendulum_r5v2__BestModelForMeanExtrinsicRolloutRewards
timeout 1200 python -m eavit_tpu --eval \
  --config_path configs/pendulum_continuous.conf \
  --load_model_path "$BEST" --greedy --num_episodes 5 \
  --log_name pendulum_r5v2_eval
cp logs/pendulum_r5v2_eval_rank0.log results/pendulum/eval_v2_seed42.log
