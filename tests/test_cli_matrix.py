"""CLI smoke matrix: batches of rarely-driven flags through the real
entry point (`cli_main`). The reference exposes ~150 flags in 20 groups
(settings.cpp:40-302); each batch here must parse, run end to end on a
tiny input, and leave the expected artifacts — catching plumbing
regressions (flags that parse but crash or go inert) that API-level
tests cannot see."""
import os

import pytest

from pagan2_tpu.cli import main as cli_main


@pytest.fixture()
def tiny(tmp_path):
    fas = tmp_path / "in.fas"
    fas.write_text(">a\nACGTACGTAGGTAC\n>b\nACGAACGTAGGTAC\n"
                   ">c\nACGTACGTACGTAC\n>d\nACGTACCTAGGTAC\n")
    nh = tmp_path / "in.nh"
    nh.write_text("((a:0.1,b:0.1):0.05,(c:0.1,d:0.1):0.05);\n")
    return fas, nh


def _run(args):
    rc = cli_main([str(a) for a in args])
    assert rc in (0, None)


def test_output_artifact_flags(tiny, tmp_path):
    fas, nh = tiny
    out = tmp_path / "out"
    mp = tmp_path / "g.mp"
    pp = tmp_path / "p.mp"
    clog = tmp_path / "run.cfg"
    _run(["-s", fas, "-t", nh, "-o", out,
          "--xml", "--output-nhx-tree", "--output-graph", "--events",
          "--output-ancestors", "--full-probability",
          "--mpost-graph-file", mp, "--output-leaf-graphs",
          "--output-alignment-graphs",
          "--mpost-posterior-plot-file", pp, "--plot-slope-up",
          "--config-log-file", clog, "--time"])
    base = str(out)
    for suffix in (".fas", ".xml", ".grp", ".anctree", ".nhx_tree",
                   ".events"):
        assert os.path.exists(base + suffix), suffix
    assert mp.exists() and "beginfig" in mp.read_text()
    assert pp.exists() and "beginfig" in pp.read_text()
    # the config log is written in replayable config-file syntax
    # (settings.cpp:304-510), not as CLI flags
    assert clog.exists() and "xml = 1" in clog.read_text()


def test_model_and_branch_flags(tiny, tmp_path):
    fas, nh = tiny
    _run(["-s", fas, "-t", nh, "-o", tmp_path / "m1",
          "--indel-rate", "0.05", "--gap-extension", "0.7",
          "--end-gap-extension", "0.9", "--dna-kappa", "3",
          "--dna-rho", "1.5", "--ambiguity-factor", "0.8",
          "--scale-branches", "1.2", "--min-branch-length", "0.02"])
    _run(["-s", fas, "-t", nh, "-o", tmp_path / "m2",
          "--no-log-odds", "--truncate-branches", "0.2",
          "--fixed-branches", "0.15", "--mostcommon", "--seed", "7"])
    _run(["-s", fas, "-t", nh, "-o", tmp_path / "m3",
          "--sample-path", "--sample-additional-paths", "1",
          "--weight-sampled-edges", "--seed", "11"])
    assert os.path.exists(str(tmp_path / "m3") + ".fas")


def test_anchoring_flags(tiny, tmp_path):
    fas, nh = tiny
    _run(["-s", fas, "-t", nh, "-o", tmp_path / "a1", "--no-anchors"])
    _run(["-s", fas, "-t", nh, "-o", tmp_path / "a2",
          "--use-prefix-anchors", "--prefix-hit-length", "5",
          "--anchors-offset", "8"])
    # identical tiny input: anchored and unanchored must agree
    r1 = open(str(tmp_path / "a1") + ".fas").read()
    r2 = open(str(tmp_path / "a2") + ".fas").read()
    assert r1 == r2


def test_prune_trim_flags(tiny, tmp_path):
    fas, nh = tiny
    out = tmp_path / "pr"
    _run(["-s", fas, "-t", nh, "-o", out, "--prune-extended-alignment",
          "--prune-keep-number", "2"])
    pruned = [p for p in os.listdir(tmp_path)
              if p.startswith("pr.pruned")]
    assert pruned, os.listdir(tmp_path)
    out2 = tmp_path / "tr"
    _run(["-s", fas, "-t", nh, "-o", out2, "--trim-extended-alignment",
          "--trim-keep-sites", "4"])
    assert any(p.startswith("tr.trimmed") for p in os.listdir(tmp_path))


def test_placement_flag_batch(tiny, tmp_path):
    fas, nh = tiny
    q = tmp_path / "q.fas"
    q.write_text(">q1\nACGTACGTAGGT\n>junk\nTTTTTTTTTTTT\n")
    out = tmp_path / "pl"
    _run(["--ref-seqfile", fas, "--ref-treefile", nh, "-q", q,
          "-o", out, "--min-query-overlap", "0.2",
          "--min-query-identity", "0.3", "--one-placement-only",
          "--output-discarded-queries", "--use-identity-score",
          "--query-distance", "0.2"])
    text = open(str(out) + ".fas").read()
    assert "q1" in text and "junk" not in text


def test_pileup_flag_batch(tmp_path):
    q = tmp_path / "reads.fas"
    base = "ACGGGTACCTTAGGCAATTGGCAAACGTTACGGT" * 3
    rows = []
    for i in range(5):
        rows.append(">r%d\n%s\n" % (i, base[i * 12:i * 12 + 60]))
    q.write_text("".join(rows))
    out = tmp_path / "pu"
    _run(["--pileup", "--454", "-q", q, "-o", out,
          "--use-consensus", "--consensus-minimum", "1",
          "--consensus-minimum-proportion", "0.1",
          "--show-contig-ancestor", "--build-contigs",
          "--qscore-minimum", "10"])
    assert os.path.exists(str(out) + ".fas")
    assert any(p.startswith("pu_contigs") for p in os.listdir(tmp_path))
