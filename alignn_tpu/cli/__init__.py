"""Command-line entry points (reference L5: train_alignn.py,
pretrained.py, run_alignn_ff.py, cli.py)."""
