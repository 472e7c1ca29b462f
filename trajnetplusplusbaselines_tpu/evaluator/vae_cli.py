"""CLI: evaluate trained VAE models (alias of the shared driver; see sgan_cli)."""

from .lstm_cli import main

if __name__ == "__main__":
    main()
