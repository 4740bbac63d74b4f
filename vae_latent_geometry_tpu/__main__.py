from vae_latent_geometry_tpu.cli import main

main()
