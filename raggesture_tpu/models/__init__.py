"""Model zoo: VAE codec, denoiser, architectures, losses, FGD embedder."""
