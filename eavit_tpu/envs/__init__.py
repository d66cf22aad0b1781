"""Environment layer: wrapper stack, vectorized pools, synthetic envs."""
