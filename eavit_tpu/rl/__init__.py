"""RL algorithm layer: PPO/RND losses, normalizers, agent, rollout."""
