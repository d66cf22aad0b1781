# round-5: continuous-action learning on a REAL environment (VERDICT #4).
# Pixel Pendulum-v1 through the full CLI: tanh-mu + log_std Normal heads
# (reference model.py:97-101, agents.py:197-203), PPO update, greedy eval
# playback of the best checkpoint. Artifacts: results/pendulum/ curve +
# eval log.
cd /root/repo
mkdir -p results/pendulum checkpoints/pendulum
timeout 5400 python -m eavit_tpu --train \
  --config_path configs/pendulum_continuous.conf \
  --num_env_per_process 16 --total_updates 400 --seed 42 \
  --save_model_path checkpoints/pendulum --log_name pendulum_r5
python scripts/pendulum_curve.py logs/pendulum_r5_rank0.log \
  results/pendulum/curve_seed42.jsonl
BEST=checkpoints/pendulum/pendulum_r5__BestModelForMeanUndiscountedEpisodeReturn
[ -f "$BEST.msgpack" ] || BEST=checkpoints/pendulum/pendulum_r5__BestModelForMeanExtrinsicRolloutRewards
timeout 1200 python -m eavit_tpu --eval \
  --config_path configs/pendulum_continuous.conf \
  --load_model_path "$BEST" --greedy --num_episodes 5 \
  --log_name pendulum_r5_eval
cp logs/pendulum_r5_eval_rank0.log results/pendulum/eval_seed42.log
