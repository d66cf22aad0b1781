"""Model zoo: dual-token ViTs, actor-critic heads, RND nets, SSL heads."""
