"""Regression guards for the driver-window rotation machinery.

The round driver verifies only the FIRST 50 registry keys each round;
``operators._prioritized`` orders the registry so unverified keys come
first, then green keys by OLDEST verdict round (source-stale keys
ahead of untouched ones within the same round).  Verdict age outranks
staleness across rounds — the round-8 change after edit bursts twice
displaced r2-vintage verdicts out of the window (VERDICT r6 item 4 →
r7 backlog).  A silent ordering bug here means the driver re-verifies
the wrong keys and new or edited operators ship without a verdict —
so the invariants are pinned.
"""

from __future__ import annotations

from parquet_stream_writer_spark import operators as ops

WINDOW = 50


def _ranked():
    merged: dict = {}
    for mod in ops._modules():
        merged.update(mod.QUERIES)
    verdicts = ops._verdicts()
    stale = ops._source_stale_keys(merged)
    oracle_stale = ops._oracle_stale_keys(merged)
    ordered = list(ops._prioritized(merged))

    def rank(k: str) -> tuple[int, int, int]:
        green, rnd = verdicts.get(k, (False, 0))
        if not green or k in oracle_stale:
            return (0, 0, 0)
        return (1, rnd, 0 if k in stale else 1)

    return merged, verdicts, ordered, rank


def test_ordering_is_deterministic():
    a = list(ops.all_queries())
    b = list(ops.all_queries())
    assert a == b
    # the driver looks oracles up BY KEY (ordering is irrelevant);
    # what matters is that every query has its oracle and vice versa
    assert set(ops.all_oracles()) <= set(a)


def test_rank_is_monotone():
    """The registry order must be exactly the rank order: unverified
    keys first, then green keys by oldest verdict round with
    source-stale keys leading their round cohort — a green key sitting
    above an unverified key would burn a window slot the new key
    needs, and a fresh verdict sitting above an old one re-opens the
    r2-backlog spill."""
    _merged, _verdicts, ordered, rank = _ranked()
    ranks = [rank(k) for k in ordered]
    assert ranks == sorted(ranks), [
        (k, r) for k, r in zip(ordered, ranks) if ranks != sorted(ranks)
    ][:10]


def test_unverified_keys_land_in_the_window():
    """Every key with no green driver verdict must sit inside the
    50-key prefix — if tier 0 ever outgrows the window, this fails
    and the registry must stop growing (or the window must move)."""
    _merged, verdicts, ordered, rank = _ranked()
    tier0 = [k for k in ordered if rank(k)[0] == 0]
    assert len(tier0) <= WINDOW, (
        f"{len(tier0)} unverified keys exceed the {WINDOW}-key driver window"
    )
    window = set(ordered[:WINDOW])
    missing = [k for k in tier0 if k not in window]
    assert not missing, missing


def test_fold_advances_only_driver_attested_hashes(tmp_path):
    """ADVICE r8 (staleness laundering): the attested snapshot must
    advance a key's hash ONLY when a driver artifact verified that
    exact source — green-in-CORRECTNESS AND unchanged since the
    pending snapshot.  Red keys, unverified keys, and keys edited
    after the pending snapshot must keep their old attested hash."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "tools"))
    import record_query_hashes as tool

    queries = ops.all_queries()
    keys = list(queries)[:4]
    verified_ok, verified_red, unverified, edited = keys
    cur = {k: ops.query_source_hash(queries[k]) for k in keys}

    root = tmp_path
    (root / "PENDING_QUERY_HASHES.json").write_text(
        json.dumps(
            {
                "for_round_after": 8,
                "hashes": {
                    verified_ok: cur[verified_ok],
                    verified_red: cur[verified_red],
                    unverified: cur[unverified],
                    # pending recorded a hash the CURRENT source no
                    # longer matches — an edit after the snapshot.
                    edited: "hash-at-snapshot-time",
                },
            }
        )
    )
    (root / "QUERY_SOURCE_HASHES.json").write_text(
        json.dumps(
            {
                "as_of_round": 8,
                "hashes": {k: f"old-attested-{k}" for k in keys},
            }
        )
    )
    (root / "CORRECTNESS_r09.json").write_text(
        json.dumps(
            {
                verified_ok: {"hash_match": True},
                verified_red: {"hash_match": False},
                edited: {"hash_match": True},
            }
        )
    )
    tool.fold_attested(str(root))
    out = json.loads((root / "QUERY_SOURCE_HASHES.json").read_text())
    assert out["as_of_round"] == 9
    h = out["hashes"]
    assert h[verified_ok] == cur[verified_ok], "green verdict must fold"
    assert h[verified_red] == f"old-attested-{verified_red}", "red kept stale"
    assert h[unverified] == f"old-attested-{unverified}", "unwindowed kept"
    assert h[edited] == f"old-attested-{edited}", (
        "edited-since-pending must stay stale even with a green verdict"
    )

    # A CORRECTNESS file that PREDATES the pending snapshot must not
    # fold anything (its verdicts attest older sources).
    (root / "PENDING_QUERY_HASHES.json").write_text(
        json.dumps({"for_round_after": 9, "hashes": {verified_ok: "newer"}})
    )
    tool.fold_attested(str(root))
    out2 = json.loads((root / "QUERY_SOURCE_HASHES.json").read_text())
    assert out2["hashes"] == h, "stale-pending fold must be a no-op"


def test_oldest_verdicts_fill_the_remaining_window():
    """After the unverified keys, the window must hold exactly the
    OLDEST green verdicts: no green key outside the window may carry
    an older verdict round than any green key inside it (the
    "no key older than r3 after this round" criterion is this
    invariant applied at round 8)."""
    _merged, verdicts, ordered, rank = _ranked()
    greens = [k for k in ordered if rank(k)[0] == 1]
    inside = set(ordered[:WINDOW])
    in_rounds = [verdicts[k][1] for k in greens if k in inside]
    out_rounds = [verdicts[k][1] for k in greens if k not in inside]
    if in_rounds and out_rounds:
        assert max(in_rounds) <= min(out_rounds), (
            max(in_rounds),
            min(out_rounds),
        )


def test_oracle_stale_outranks_impl_stale(monkeypatch):
    """VERDICT r9 item 3: an ORACLE-text rewrite retires the attested
    comparison itself, so the key must rank like a never-verified key
    (tier 0, guaranteed window slot) — while a plain implementation
    edit stays a rank-1 stale key inside its verdict-round cohort.
    Pre-fix, the q1/q22 integer-cents rewrites (oracle + impl changed)
    ranked behind the r4 cohort and would not re-attest until ~r11."""
    merged: dict = {}
    for mod in ops._modules():
        merged.update(mod.QUERIES)
    verdicts = ops._verdicts()
    impl_stale, oracle_stale = None, None
    for k in merged:
        green, _rnd = verdicts.get(k, (False, 0))
        if green and ops.oracle_text_hash(k) is not None:
            if impl_stale is None:
                impl_stale = k
            elif oracle_stale is None and k != impl_stale:
                oracle_stale = k
                break
    assert impl_stale and oracle_stale

    fake = {
        "as_of_round": 9,
        "hashes": {
            # both keys' implementations changed since attestation...
            impl_stale: "retired-impl-hash",
            oracle_stale: "retired-impl-hash",
        },
        "oracle_hashes": {
            # ...but only one key's ORACLE text did.
            impl_stale: ops.oracle_text_hash(impl_stale),
            oracle_stale: "retired-oracle-hash",
        },
    }
    monkeypatch.setattr(ops, "_snapshot_doc", lambda: fake)
    ordered = list(ops._prioritized(merged))
    verdict_rnd = verdicts[impl_stale][1]
    cohort = [
        k
        for k in ordered
        if verdicts.get(k, (False, 0)) == (True, verdict_rnd)
        and k not in ops._oracle_stale_keys(merged)
    ]
    # impl-stale: stays green-tier, but LEADS its verdict-round cohort.
    assert cohort[0] == impl_stale
    # oracle-stale: promoted to tier 0 — ahead of every green key.
    first_green = next(
        i
        for i, k in enumerate(ordered)
        if verdicts.get(k, (False, 0))[0] and k != oracle_stale
    )
    assert ordered.index(oracle_stale) < first_green
    # A key ABSENT from oracle_hashes (pre-r10 snapshot) must not be
    # treated as oracle-stale.
    assert not ops._oracle_stale_keys({"never_recorded": merged[impl_stale]})


def test_fold_advances_oracle_hashes_with_attestations(tmp_path):
    """The fold must advance a green key's attested ORACLE hash in
    lockstep with its source hash, and leave red/unverified keys'
    oracle hashes untouched — otherwise an oracle rewrite would stay
    tier-0 forever (or worse, launder silently)."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "tools"))
    import record_query_hashes as tool

    queries = ops.all_queries()
    keys = [k for k in queries if ops.oracle_text_hash(k) is not None][:2]
    green, red = keys
    cur = {k: ops.query_source_hash(queries[k]) for k in keys}
    cur_oracle = {k: ops.oracle_text_hash(k) for k in keys}

    root = tmp_path
    (root / "PENDING_QUERY_HASHES.json").write_text(
        json.dumps(
            {
                "for_round_after": 9,
                "hashes": cur,
                "oracle_hashes": cur_oracle,
            }
        )
    )
    (root / "QUERY_SOURCE_HASHES.json").write_text(
        json.dumps(
            {
                "as_of_round": 9,
                "hashes": {k: f"old-{k}" for k in keys},
                "oracle_hashes": {k: f"old-oracle-{k}" for k in keys},
            }
        )
    )
    (root / "CORRECTNESS_r10.json").write_text(
        json.dumps({green: {"hash_match": True}, red: {"hash_match": False}})
    )
    tool.fold_attested(str(root))
    out = json.loads((root / "QUERY_SOURCE_HASHES.json").read_text())
    assert out["oracle_hashes"][green] == cur_oracle[green]
    assert out["oracle_hashes"][red] == f"old-oracle-{red}"


def test_refold_of_banked_round_is_a_noop(tmp_path, capsys):
    """A second ``--fold`` for an already-attested round must change
    NOTHING (observed live at round-10 start: the re-run kept the
    source hashes but silently dropped the 50 seeded oracle hashes of
    the round-9 window, because the pre-oracle pending file reads as
    'these keys have no oracle')."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "tools"))
    import record_query_hashes as tool

    queries = ops.all_queries()
    key = next(k for k in queries if ops.oracle_text_hash(k) is not None)
    cur = ops.query_source_hash(queries[key])

    root = tmp_path
    # Legacy pending: NO oracle_hashes section (pre-r10 format).
    (root / "PENDING_QUERY_HASHES.json").write_text(
        json.dumps({"for_round_after": 8, "hashes": {key: cur}})
    )
    (root / "QUERY_SOURCE_HASHES.json").write_text(
        json.dumps(
            {
                "as_of_round": 8,
                "hashes": {key: "old-attested"},
                "oracle_hashes": {key: "seeded-oracle-hash"},
            }
        )
    )
    (root / "CORRECTNESS_r09.json").write_text(
        json.dumps({key: {"hash_match": True}})
    )
    tool.fold_attested(str(root))
    first = (root / "QUERY_SOURCE_HASHES.json").read_text()
    out = json.loads(first)
    assert out["hashes"][key] == cur
    # Legacy pending carries no oracle information — the seeded oracle
    # attestation must survive the fold, not be retired.
    assert out["oracle_hashes"][key] == "seeded-oracle-hash"

    # Folding the SAME round again must be a byte-identical no-op.
    capsys.readouterr()
    tool.fold_attested(str(root))
    assert "no fold" in capsys.readouterr().out
    assert (root / "QUERY_SOURCE_HASHES.json").read_text() == first


def test_fold_attestation_set_equal_across_pending_formats(tmp_path):
    """VERDICT r10 item 6 (format-migration net): folding the SAME
    green verdicts from a legacy pending (no ``oracle_hashes``
    section) and from a current-format pending must land the SAME
    attestation set — identical source hashes, identical attested
    round, and byte-identical snapshots when the pending oracle info
    agrees with the seeds.  Divergence is allowed ONLY where the
    current format explicitly records a key as oracle-less (rows-only
    retirement), which the legacy format cannot express.  The round-10
    fold bug was exactly a format-migration fallout; any future
    snapshot-format change must keep this test green."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "tools"))
    import record_query_hashes as tool

    queries = ops.all_queries()
    k1, k2 = [k for k in queries if ops.oracle_text_hash(k) is not None][:2]
    cur = {k: ops.query_source_hash(queries[k]) for k in (k1, k2)}
    cur_oracle = {k: ops.oracle_text_hash(k) for k in (k1, k2)}

    attested = {
        "as_of_round": 8,
        "hashes": {k1: "old-1", k2: "old-2"},
        "oracle_hashes": dict(cur_oracle),
    }
    correctness = {k1: {"hash_match": True}, k2: {"hash_match": True}}

    def fold(pending: dict) -> str:
        root = tmp_path / f"fmt{len(list(tmp_path.iterdir()))}"
        root.mkdir()
        (root / "PENDING_QUERY_HASHES.json").write_text(json.dumps(pending))
        (root / "QUERY_SOURCE_HASHES.json").write_text(json.dumps(attested))
        (root / "CORRECTNESS_r09.json").write_text(json.dumps(correctness))
        tool.fold_attested(str(root))
        return (root / "QUERY_SOURCE_HASHES.json").read_text()

    legacy = fold({"for_round_after": 8, "hashes": dict(cur)})
    current = fold(
        {
            "for_round_after": 8,
            "hashes": dict(cur),
            "oracle_hashes": dict(cur_oracle),
        }
    )
    # Agreeing oracle info → the two formats fold byte-identically.
    assert legacy == current
    out = json.loads(legacy)
    assert out["as_of_round"] == 9
    assert out["hashes"] == cur
    assert out["oracle_hashes"] == cur_oracle

    # Current format CAN retire an oracle attestation (key recorded as
    # rows-only); the divergence must be exactly that retirement.
    retired = json.loads(
        fold(
            {
                "for_round_after": 8,
                "hashes": dict(cur),
                "oracle_hashes": {k1: cur_oracle[k1]},
            }
        )
    )
    assert retired["hashes"] == cur, "source attestations never diverge"
    assert retired["oracle_hashes"] == {k1: cur_oracle[k1]}


def test_snapshot_pending_autofolds_unbanked_round(tmp_path, capsys):
    """ADVICE r9 (record_query_hashes self-heal): running the plain
    session-end snapshot while a landed CORRECTNESS round is still
    unfolded must auto-fold FIRST — otherwise pending.for_round_after
    catches up to that round and the ``rnd <= for_round_after`` guard
    makes its attestations permanently unfoldable."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "tools"))
    import record_query_hashes as tool

    queries = ops.all_queries()
    key = next(iter(queries))
    cur = ops.query_source_hash(queries[key])

    root = tmp_path
    (root / "PENDING_QUERY_HASHES.json").write_text(
        json.dumps({"for_round_after": 9, "hashes": {key: cur}})
    )
    (root / "QUERY_SOURCE_HASHES.json").write_text(
        json.dumps({"as_of_round": 9, "hashes": {key: "old-attested"}})
    )
    (root / "CORRECTNESS_r10.json").write_text(
        json.dumps({key: {"hash_match": True}})
    )
    tool.snapshot_pending(str(root))
    out = json.loads((root / "QUERY_SOURCE_HASHES.json").read_text())
    # the green r10 verdict was banked before pending was replaced
    assert out["as_of_round"] == 10
    assert out["hashes"][key] == cur
    pending = json.loads((root / "PENDING_QUERY_HASHES.json").read_text())
    assert pending["for_round_after"] == 10
    assert "auto-folding" in capsys.readouterr().out


def test_fold_overdue_warning_fires_and_clears(tmp_path, capsys, monkeypatch):
    """The registry must warn (stderr, once) when a CORRECTNESS round
    newer than both the pending and attested snapshots exists — and
    stay silent once the fold has advanced the attested round."""
    import json

    root = tmp_path
    (root / "PENDING_QUERY_HASHES.json").write_text(
        json.dumps({"for_round_after": 8, "hashes": {}})
    )
    (root / "QUERY_SOURCE_HASHES.json").write_text(
        json.dumps({"as_of_round": 8, "hashes": {}})
    )
    (root / "CORRECTNESS_r09.json").write_text("{}")

    monkeypatch.setattr(
        ops,
        "_correctness_snapshot",
        lambda: ((str(root / "CORRECTNESS_r09.json"), 0.0),),
    )
    ops._warn_if_fold_overdue._done = False
    ops._warn_if_fold_overdue(str(root))
    err = capsys.readouterr().err
    assert "--fold" in err and "CORRECTNESS_r9" in err

    # Fires once per process: a second call is silent even while due.
    ops._warn_if_fold_overdue(str(root))
    assert "--fold" not in capsys.readouterr().err

    # After the fold advances the attested round, the warning clears.
    (root / "QUERY_SOURCE_HASHES.json").write_text(
        json.dumps({"as_of_round": 9, "hashes": {}})
    )
    ops._warn_if_fold_overdue._done = False
    ops._warn_if_fold_overdue(str(root))
    assert "--fold" not in capsys.readouterr().err
    ops._warn_if_fold_overdue._done = False


def test_fold_without_correctness_artifact_is_a_noop(tmp_path, capsys):
    """Running --fold on a fresh clone (no CORRECTNESS_r*.json) must
    not write anything: an empty {as_of_round: 0} snapshot would
    suppress snapshot_pending's bootstrap and mark the whole registry
    stale against an empty hash set."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "tools"))
    import record_query_hashes as tool

    tool.fold_attested(str(tmp_path))
    assert "no fold" in capsys.readouterr().out
    assert not (tmp_path / "QUERY_SOURCE_HASHES.json").exists()


def test_reduce_site_audit_traces_aliases_and_variables(capsys):
    """The sweep enumerator must keep finding the indirections the
    manual audits relied on: a quantized local variable (term6 :=
    quant6 in text_quality_psi), a count-defined alias (o := F.count
    in the chi-square cells), and a withColumn-defined column (dwell
    := F.lead diff in the dwell profile). A tracing regression would
    blind the round-16+ window sweeps."""
    import sys as _sys

    _sys.path.insert(
        0, str(__import__("pathlib").Path(__file__).parents[1] / "tools")
    )
    import reduce_site_audit as rsa

    n = rsa.audit(
        [
            "text_quality_psi",
            "agg_chi_square_independence",
            "events_dwell_time_profile",
        ]
    )
    out = capsys.readouterr().out
    assert "term6 = quant6" in out.replace("term6 = term6 = ", "term6 = ")
    assert 'F.count(F.lit(1)).alias("o")' in out
    assert 'withColumn("dwell", F.lead("us").over(w) - F.col("us"))' in out
    # all three keys have sites needing the read (by design: only
    # certain patterns auto-verdict)
    assert n == 3


def test_reduce_site_audit_expr_agg_tests_inner_argument(capsys, monkeypatch):
    """ADVICE r15: for aggregates hidden inside an F.expr string the
    _CERTAIN auto-exemption must be tested against the INNER
    sum/avg/mean call's own argument — a quant6( appearing elsewhere
    in the same string must not exempt a fractional sum next to it
    (the exact silent-pass the tool's docstring warns about)."""
    import sys as _sys

    _sys.path.insert(
        0, str(__import__("pathlib").Path(__file__).parents[1] / "tools")
    )
    import reduce_site_audit as rsa

    def fake_expr_key(spark, sf_dir):  # never executed; source-only
        df = spark.read.parquet(sf_dir)
        return df.select(
            F.expr("sum(price * ratio) + sum(quant6(price)) as s")  # noqa: F821
        )

    monkeypatch.setattr(rsa, "all_queries", lambda: {"fake": fake_expr_key})
    n = rsa.audit(["fake"])
    out = capsys.readouterr().out
    # two inner sites: the fractional sum prints as READ with ITS OWN
    # argument; the quantized sum auto-exempts
    assert n == 1
    assert "1 READ site(s), 1 certain-exempt" in out
    assert "price * ratio" in out
    assert "quant6(price)" not in out.split("L")[-1].splitlines()[0]


def test_reduce_site_audit_flag_without_value_exits_with_usage(monkeypatch, capsys):
    """ADVICE r15: `--keys` / `--window` as the final argument must
    exit with a usage message, not an IndexError."""
    import sys as _sys

    _sys.path.insert(
        0, str(__import__("pathlib").Path(__file__).parents[1] / "tools")
    )
    import reduce_site_audit as rsa
    import pytest

    for argv in (["prog", "--keys"], ["prog", "--window"]):
        monkeypatch.setattr(_sys, "argv", argv)
        with pytest.raises(SystemExit) as e:
            rsa.main()
        assert e.value.code == 2
        assert "usage:" in capsys.readouterr().out


def test_reduce_site_audit_bad_flag_values_exit_with_usage(monkeypatch, capsys):
    """ADVICE r16: a non-integer `--window abc` / `--window=abc` must
    land on the same usage/exit-2 path as a missing value (not an
    uncaught ValueError traceback), and `--keys` followed by another
    flag must be treated as a missing value, not consumed as keys."""
    import sys as _sys

    _sys.path.insert(
        0, str(__import__("pathlib").Path(__file__).parents[1] / "tools")
    )
    import reduce_site_audit as rsa
    import pytest

    for argv in (
        ["prog", "--window", "abc"],
        ["prog", "--window=abc"],
        ["prog", "--keys", "--quiet"],
    ):
        monkeypatch.setattr(_sys, "argv", argv)
        with pytest.raises(SystemExit) as e:
            rsa.main()
        assert e.value.code == 2, argv
        assert "usage:" in capsys.readouterr().out, argv


def test_reduce_site_audit_balances_parens_across_string_literals():
    """ADVICE r16: an unbalanced paren inside a quoted literal (regexp
    patterns in F.expr bodies are the real-world case) must not
    truncate or overrun the extracted argument."""
    import sys as _sys

    _sys.path.insert(
        0, str(__import__("pathlib").Path(__file__).parents[1] / "tools")
    )
    import reduce_site_audit as rsa

    src = 'F.sum(F.regexp_count("text", r"\\)([a-z]") + F.col("x"))'
    arg = rsa._balanced_arg(src, src.index("("))
    assert arg == 'F.regexp_count("text", r"\\)([a-z]") + F.col("x")'
    # escaped quote inside the literal doesn't end the string early
    src2 = "F.sum(F.lit('don\\'t (') + F.col(\"y\"))"
    assert rsa._balanced_arg(src2, src2.index("(")) == (
        "F.lit('don\\'t (') + F.col(\"y\")"
    )


def test_reduce_site_audit_skips_comment_spans():
    """Self-review r17: an apostrophe in a trailing comment inside a
    reduce-call argument span must not open a phantom string (the
    ADVICE r16 quote-skipping introduced this hole)."""
    import sys as _sys

    _sys.path.insert(
        0, str(__import__("pathlib").Path(__file__).parents[1] / "tools")
    )
    import reduce_site_audit as rsa

    src = "F.sum(\n    q_c  # don't double-count\n    + F.col(\"x\")\n)"
    arg = rsa._balanced_arg(src, src.index("("))
    assert arg == "\n    q_c  # don't double-count\n    + F.col(\"x\")\n"
    # a comment holding an unbalanced paren is equally inert
    src2 = 'F.sum(a  # see foo(bar\n      + b)'
    assert rsa._balanced_arg(src2, src2.index("(")) == (
        "a  # see foo(bar\n      + b"
    )
