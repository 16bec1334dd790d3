#!/usr/bin/env python
"""Phonon band structure + DOS plots from a trained FF.

Equivalent of reference `scripts/plot_phonons_ff.py`: run the harmonic
phonon pipeline (ff/phonons.py) for a structure and save band/DOS plots.
"""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--file_path", required=True)
    p.add_argument("--supercell", default="2,2,2")
    p.add_argument("--output_prefix", default="phonons")
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from alignn_tpu.chem.atoms import Atoms
    from alignn_tpu.ff.calculator import Calculator
    from alignn_tpu.ff import phonons as ph

    atoms = Atoms.from_file(args.file_path)
    calc = Calculator(path=args.model_path)
    sc = tuple(int(x) for x in args.supercell.split(","))
    bands = ph.phonon_band_structure(calc, atoms, supercell=sc)
    fc = bands.get("fcdata") or bands.get("fc")

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    freqs = np.asarray(bands["frequencies_THz"])  # [nq, nmodes]
    for mode in range(freqs.shape[1]):
        axes[0].plot(freqs[:, mode], lw=0.8)
    axes[0].set_ylabel("THz")
    axes[0].set_title("Phonon bands")
    dos = ph.phonon_dos(fc)
    axes[1].plot(dos["frequencies_THz"], dos["dos"])
    axes[1].set_title("DOS")
    axes[1].set_xlabel("THz")
    fig.tight_layout()
    out = f"{args.output_prefix}_bands_dos.png"
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
