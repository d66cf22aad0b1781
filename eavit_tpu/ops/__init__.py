"""TPU compute ops: GAE scan, fused attention kernels, preprocessing."""
