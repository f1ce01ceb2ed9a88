"""Native mapper: index + map + cigar/NM/MD correctness on synthetic refs."""

import numpy as np
import pytest

BASES = np.array(list("ACGT"))


def rand_seq(rng, n):
    return "".join(rng.choice(BASES, size=n))


def revcomp(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


@pytest.fixture(scope="module")
def ref_and_aligner(tmp_path_factory):
    from bonito_tpu.aligner import Aligner
    rng = np.random.default_rng(42)
    contigs = [("chr1", rand_seq(rng, 20000)), ("chr2", rand_seq(rng, 8000))]
    path = tmp_path_factory.mktemp("ref") / "ref.fasta"
    with open(path, "w") as f:
        for name, seq in contigs:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")
    return dict(contigs), Aligner(path)


def mutate(rng, seq, sub_rate=0.05, indel_rate=0.02):
    out = []
    for c in seq:
        r = rng.random()
        if r < indel_rate / 2:
            continue                      # deletion
        if r < indel_rate:
            out.append(rng.choice(BASES))  # insertion
        if rng.random() < sub_rate:
            out.append(rng.choice([b for b in "ACGT" if b != c]))
        else:
            out.append(c)
    return "".join(out)


class TestMapper:
    def test_exact_forward(self, ref_and_aligner):
        contigs, aligner = ref_and_aligner
        read = contigs["chr1"][5000:7000]
        m = aligner.map(read)
        assert m is not None
        assert m.ctg == "chr1"
        assert m.strand == 1
        assert m.r_st == 5000 and m.r_en == 7000
        assert m.cigar_str == "2000="
        assert m.NM == 0
        assert m.MD == "2000"

    def test_exact_reverse(self, ref_and_aligner):
        contigs, aligner = ref_and_aligner
        read = revcomp(contigs["chr2"][1000:3000])
        m = aligner.map(read)
        assert m is not None
        assert m.ctg == "chr2"
        assert m.strand == -1
        assert m.r_st == 1000 and m.r_en == 3000
        assert m.NM == 0

    def test_mutated_read(self, ref_and_aligner):
        contigs, aligner = ref_and_aligner
        rng = np.random.default_rng(0)
        read = mutate(rng, contigs["chr1"][10000:13000])
        m = aligner.map(read)
        assert m is not None
        assert m.ctg == "chr1"
        assert abs(m.r_st - 10000) < 50
        counts = m.cigar_counts
        total = sum(counts.values())
        assert counts["="] / total > 0.85
        # NM consistency: X + I + D
        assert m.NM == counts.get("X", 0) + counts.get("I", 0) + counts.get("D", 0)

    def test_ref_seq_matches_span(self, ref_and_aligner):
        contigs, aligner = ref_and_aligner
        read = contigs["chr1"][2000:2500]
        m = aligner.map(read)
        assert m.ref_seq == contigs["chr1"][m.r_st:m.r_en]

    def test_no_hit_for_random(self, ref_and_aligner):
        _, aligner = ref_and_aligner
        rng = np.random.default_rng(99)
        assert aligner.map(rand_seq(rng, 500)) is None or True  # may map by chance; just runs

    def test_empty_and_short(self, ref_and_aligner):
        _, aligner = ref_and_aligner
        assert aligner.map("") is None
        assert aligner.map("ACGT") is None

    def test_align_map_stage(self, ref_and_aligner):
        from bonito_tpu.aligner import align_map
        contigs, aligner = ref_and_aligner

        class R:
            read_id = "r1"
        results = [(R(), {"sequence": contigs["chr1"][100:600],
                          "qstring": "#" * 500})]
        out = list(align_map(aligner, iter(results), n_thread=2))
        assert len(out) == 1
        read, res = out[0]
        assert res["mapping"].ctg == "chr1"
