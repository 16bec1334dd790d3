#!/usr/bin/env python
"""Plot FF training histories + parity scatters.

Equivalent of reference `scripts/plot_ff_results.py` (which calls
`alignn.ff.ff.plot_ff_training`); wraps
alignn_tpu.train.plots.plot_ff_training over one or more run dirs.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dirs", nargs="+", help="training output dirs")
    p.add_argument("--results", default="Val_results.json")
    args = p.parse_args(argv)

    from alignn_tpu.train.plots import plot_ff_training

    for d in args.dirs:
        plot_ff_training(d, results=args.results)
        print(f"plots written under {d} (history.png, parity.png)")


if __name__ == "__main__":
    main()
