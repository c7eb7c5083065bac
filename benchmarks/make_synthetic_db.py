"""Offline length-distribution-realistic database generator.

The real-data benchmarks (benchmarks/rundbbenchmark.sh, mirroring
/root/reference/run{sprot,uniref50,trembl}benchmark.sh) download UniProt
releases.  On air-gapped hosts that download fails; this generator
produces a FASTA whose *length distribution* matches the real database
closely enough that packing-bucket occupancy, kernel dispatch mix and
streaming behaviour are representative — so the benchmark pipeline can
rehearse end-to-end offline (scores are obviously not comparable to real
data; parity still requires the real download, docs/PARITY.md).

Length model: log-normal, calibrated per database:
  sprot    median ~292 aa, sigma 0.64 (573k seqs, ~205M residues)
  uniref50 median ~220 aa, sigma 0.75
  trembl   median ~260 aa, sigma 0.70
clipped to [11, 35000] (Swiss-Prot's span).  Residues are uniform over
the 20 standard amino acids, seeded (default 42) for reproducibility.

Usage:
  python benchmarks/make_synthetic_db.py OUT.fasta [--preset sprot]
      [--num N] [--seed S] [--scale F]

--scale divides the preset's sequence count (e.g. --scale 100 builds a
1/100-size rehearsal DB).
"""

from __future__ import annotations

import sys

import numpy as np

PRESETS = {
    # name: (num_sequences, log-normal median aa, sigma)
    "sprot": (573_000, 292.0, 0.64),
    "uniref50": (5_000_000, 220.0, 0.75),  # scaled stand-in (real: 50M+)
    "trembl": (20_000_000, 260.0, 0.70),  # scaled stand-in (real: 250M+)
}

AAS = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)


def generate(path: str, num: int, median: float, sigma: float,
             seed: int = 42, chunk: int = 20_000) -> dict:
    """Write ``num`` synthetic records to ``path`` (plain FASTA).
    Returns {num_sequences, num_chars}."""
    rng = np.random.default_rng(seed)
    total = 0
    nl = np.uint8(ord("\n"))
    with open(path, "wb", buffering=1 << 20) as f:
        for base in range(0, num, chunk):
            n = min(chunk, num - base)
            lens = np.clip(
                rng.lognormal(np.log(median), sigma, size=n), 11, 35000
            ).astype(np.int64)
            total += int(lens.sum())
            # One residue blob for the chunk, sliced per record.
            blob = AAS[rng.integers(0, 20, size=int(lens.sum()))]
            pos = 0
            out = bytearray()
            for i in range(n):
                ln = int(lens[i])
                out += b">syn%d len %d\n" % (base + i, ln)
                out += blob[pos : pos + ln].tobytes()
                out.append(nl)
                pos += ln
            f.write(out)
    return {"num_sequences": num, "num_chars": total}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0].startswith("--"):
        print(__doc__)
        return 2
    path = argv[0]
    preset = "sprot"
    num = seed = None
    scale = 1.0
    i = 1
    while i < len(argv):
        a = argv[i]
        if a in ("--preset", "--num", "--seed", "--scale"):
            if i + 1 >= len(argv):
                print(f"Missing value for {a}")
                return 2
            i += 1
            v = argv[i]
            if a == "--preset":
                preset = v
            elif a == "--num":
                num = int(v)
            elif a == "--seed":
                seed = int(v)
            else:
                scale = float(v)
        else:
            print(f"Unexpected arg {a}")
            return 2
        i += 1
    if preset not in PRESETS:
        print(f"unknown preset {preset}; choose from {sorted(PRESETS)}")
        return 2
    pnum, median, sigma = PRESETS[preset]
    num = num if num is not None else max(1, int(pnum / scale))
    stats = generate(path, num, median, sigma, seed=42 if seed is None else seed)
    print(
        f"synthetic {preset}: {stats['num_sequences']} sequences, "
        f"{stats['num_chars']} residues -> {path}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
