"""eavit_tpu — TPU-native Explorative-Attention ViT for Model-Predictive
Exploration in Reinforcement Learning.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
PyTorch reference `cangozpi/Explorative-Attention-ViT-for-Model-Predictive-
Exploration-in-Reinforcement-Learning`:

- PPO with Random Network Distillation (RND) intrinsic rewards
  (``original_RND`` pixel-space and ``modified_RND`` embedding-space
  variants), plus a pure-PPO mode (reference agents.py:30-624).
- A dual-token "Explorative Attention" Vision Transformer backbone with a
  learnable exploration token feeding the intrinsic value head and a
  learnable exploitation token feeding the extrinsic value head
  (reference vit.py:93-167, model.py:266-354).
- Optional BYOL / Barlow-Twins self-supervised auxiliary losses sharing the
  backbone (reference BYOL.py, BarlowTwins.py), with joint training or a
  standalone SSL-pretraining phase.
- Atari / Super Mario Bros / classic-control environment stacks with the
  reference's wrapper semantics (reference envs.py:63-245).
- Data-parallel scaling over a ``jax.sharding.Mesh`` with XLA collectives
  (replacing torchrun + DistributedDataParallel, reference dist_utils.py).

Design is TPU-first, not a port: a functional core of jitted pure functions
over pytrees; the whole PPO/RND update (GAE, normalizers, epochs x
minibatches) is one compiled XLA program; both explorative and exploitative
token streams run through the transformer in a single stacked pass; the
attention hot-op has a fused Pallas flash-attention kernel.
"""

__version__ = "0.1.0"
