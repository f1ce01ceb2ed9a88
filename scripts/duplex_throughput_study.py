"""Duplex CLI throughput on this host: synthetic template/complement
pairs (~8 kb strands, independent 2%-error draws from a shared truth)
written as a BAM + pairs file, then driven through the real
`bonito_tpu duplex` CLI (ReadIndexedBam -> process_map consensus ->
DuplexWriter). The reference prints bases/sec the same way
(bonito/cli/duplex.py:372-380); this records our measured number.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python scripts/duplex_throughput_study.py [n_pairs] [strand_len]
"""
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
import numpy as np

N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
STRAND = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
WORK = Path(os.environ.get("DUPLEX_DIR", "/tmp/duplex_study"))

BASES = np.array(list("ACGT"))


def noisy_copy(rng, truth, err=0.02):
    """Substitution/indel-perturbed copy of a truth sequence."""
    out = []
    for ch in truth:
        r = rng.random()
        if r < err * 0.5:
            continue  # deletion
        if r < err * 0.75:
            out.append(rng.choice(BASES))  # substitution
        else:
            out.append(ch)
        if rng.random() < err * 0.25:
            out.append(rng.choice(BASES))  # insertion
    return "".join(out)


def build(work):
    from bonito_tpu.bam import BAMWriter
    from bonito_tpu.duplex import revcomp

    work.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    pairs = []
    with open(work / "in.bam", "wb") as fd:
        w = BAMWriter(fd, "@HD\tVN:1.6\tSO:unknown\n", [])
        for i in range(N_PAIRS):
            truth = "".join(rng.choice(BASES, size=STRAND))
            tmpl = noisy_copy(rng, truth)
            comp = revcomp(noisy_copy(rng, truth))
            qt = "".join(chr(33 + int(q))
                         for q in rng.integers(10, 30, len(tmpl)))
            qc = "".join(chr(33 + int(q))
                         for q in rng.integers(10, 30, len(comp)))
            w.write(f"tmpl{i}", tmpl, qt)
            w.write(f"comp{i}", comp, qc)
            pairs.append((f"tmpl{i}", f"comp{i}"))
        w.close()
    with open(work / "pairs.txt", "w") as f:
        f.write("template complement\n")
        for t, c in pairs:
            f.write(f"{t} {c}\n")


def main():
    # cache key covers both knobs so a changed strand length rebuilds
    stamp = WORK / f"fixture_{N_PAIRS}_{STRAND}.ok"
    if not stamp.exists():
        build(WORK)
        for old in WORK.glob("fixture_*.ok"):
            old.unlink()
        stamp.touch()
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    t0 = time.perf_counter()
    with open(WORK / "out.sam", "w") as fh, \
            open(WORK / "run.log", "w") as lg:
        subprocess.run(
            [sys.executable, "-m", "bonito_tpu", "duplex",
             str(WORK / "in.bam"), str(WORK / "pairs.txt")],
            stdout=fh, stderr=lg, env=env, check=True)
    dt = time.perf_counter() - t0
    log = (WORK / "run.log").read_text().strip().splitlines()
    for line in log[-4:]:
        print("   ", line)
    print(f"wall: {dt:.1f} s for {N_PAIRS} pairs x ~{STRAND} bases")


if __name__ == "__main__":
    main()
