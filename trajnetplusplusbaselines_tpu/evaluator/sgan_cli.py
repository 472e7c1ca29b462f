"""CLI: evaluate trained SGAN models.

The reference ships near-identical per-model evaluator scripts
(/root/reference/trajnetbaselines/sgan/trajnet_evaluator.py differs from the
lstm one only in the predictor class); here model dispatch happens inside
checkpoint loading, so this is an alias of the shared driver kept for
command-line parity.
"""

from .lstm_cli import main

if __name__ == "__main__":
    main()
