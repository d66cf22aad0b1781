# Operations recipes (reference Makefile:1-82 parity, TPU-native commands).

CONFIG ?= configs/synthetic_demo.conf
LOG_NAME ?= eavit
NUM_ENVS ?= 64
CPU_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: train eval test run_tests bench profile start_tensorboard dryrun \
	kernel_check update_bench maze_ab attn_bench bench_battery kill help

train:  ## train with the flagship-style loop (reference: make train)
	python -m eavit_tpu --train --config_path=$(CONFIG) \
		--num_env_per_process=$(NUM_ENVS) --log_name=$(LOG_NAME)

train_debug:  ## smoke run (reference --debug_params semantics)
	python -m eavit_tpu --train --config_path=$(CONFIG) --debug_params \
		--total_updates=3 --log_name=$(LOG_NAME)_debug

eval:  ## play back a checkpoint (reference: make eval)
	python -m eavit_tpu --eval --config_path=$(CONFIG) \
		--load_model_path=$(CKPT) --log_name=$(LOG_NAME)_eval

test run_tests:  ## pytest suite on the 8-device virtual CPU mesh
	python -m pytest tests/ -x -q

bench:  ## one-line JSON benchmark on the local accelerator
	python bench.py

profile:  ## trace 3 updates with jax.profiler then exit (reference pytorch_profiling)
	python -m eavit_tpu --train --config_path=$(CONFIG) --debug_params \
		--profile_updates=3 --log_name=$(LOG_NAME)_prof

start_tensorboard:  ## serve logs/tb (reference: make start_tensorboard)
	tensorboard --logdir logs/tb --port 6006

dryrun:  ## multichip sharding dry-run on 8 virtual CPU devices
	$(CPU_ENV) python __graft_entry__.py 8

kernel_check:  ## on-chip Pallas-vs-XLA attention numerics (needs the TPU)
	python scripts/tpu_kernel_check.py

update_bench:  ## seconds/update across backbone x kernel modes (needs the TPU)
	python scripts/update_bench.py

maze_ab:  ## reward-free exploration A/B (RND vs PPO) on the device maze
	python scripts/maze_ab.py --arm rnd --updates 400 --grid 20 --ep_len 512 \
		--variants 16 --int_coef 10 --tag _g20v16ic10
	python scripts/maze_ab.py --arm ppo --updates 400 --grid 20 --ep_len 512 \
		--variants 16 --int_coef 10 --tag _g20v16ic10
	python scripts/maze_ab_report.py --match g20v16ic10

attn_bench:  ## attention kernel sweep across sequence lengths (needs the TPU)
	python scripts/attn_microbench.py

bench_battery:  ## full perf battery -> logs/bench_battery_r2.log (needs the TPU)
	bash scripts/bench_battery_r2.sh

kill:  ## stop stray training processes (reference: make kill)
	pkill -f "python -m eavit_tpu" || true

help:
	@grep -E '^[a-zA-Z_ ]+:.*?##' $(MAKEFILE_LIST) | sed 's/:.*##/\t/'
