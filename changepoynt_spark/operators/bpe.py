"""BPE tokenization with merges LEARNED from the corpus — the real-pipeline
upgrade over the whitespace+hash tokenizer in operators/text.py.

Algorithm (greedy ordered-replace BPE):

* Every word (plus a trailing end-of-word marker ``EOW``) starts as its
  character sequence, materialized as a ``SEP``-delimited string
  ("h<SEP>i<SEP><EOW>").  ``SEP``/``EOW`` are control characters
  (0x1f/0x17) that are OUT OF CONTRACT in input text.
* Learning: ``n_merges`` rounds of (count adjacent symbol pairs over the
  distinct-WORD table weighted by word frequency) -> (pick the argmax pair,
  ties broken by (count DESC, lhs ASC, rhs ASC)) -> (apply the merge as a
  literal string replace ``lhs<SEP>rhs -> lhsrhs``).
* Application: build the whole document as one delimited symbol stream
  (spaces become ``EOW`` symbols), apply the K learned replaces in rank
  order, split on ``SEP``.  Because learning is per-word and ``EOW`` only
  ever appears as a symbol's final character, no learned pattern can span a
  word boundary, so the stream application is exactly the per-word
  application — without a per-word explode.

``replace`` here is literal non-overlapping left-to-right substring
replacement that RESUMES AFTER each replacement — Spark's ``F.replace``
(UTF8String.replace), DuckDB's ``replace``, and Python's ``str.replace``
all agree, including on runs: applying (l,l) to "l<SEP>l<SEP>l<SEP>l"
yields "ll<SEP>ll", which is exactly exhaustive greedy pair merging
(tests/test_bpe.py pins the three-engine agreement).  This makes the whole
tokenizer — learning AND application — expressible identically in Spark
expressions and in (unrolled) DuckDB SQL, so the driver oracle checks the
learned merge table itself, the token stream, and the byte-exact
detokenization round trip.

Variant note: chaining literal replaces is NOT bit-identical to
subword-nmt's token-list algorithm in one corner: an earlier-rank merge
output can expose a later-rank pattern across its own boundary (symbols
[a, bc] match pattern "a<SEP>b" because 'b' is a prefix of the SYMBOL
'bc').  Both engines do the same thing, segmentation stays deterministic,
and round-trip losslessness is structural (replaces only ever delete
separators, never characters).

Scale shape (the 100 TB story):

* the corpus is touched ONCE for learning (word explode -> count, one
  shuffle with map-side combine); every learning round afterwards runs on
  the cached distinct-word table, which is vocabulary-bounded (tens of
  millions of rows at worst), not corpus-bounded.
* per round: one narrow map (chained replaces from the cached base) + one
  pair-count aggregate + an argmax take(1) — the only driver-side data is
  ONE ROW per round.
* application is a zero-shuffle whole-stage-codegen scan: the merge table
  rides into the plan as K literal replace expressions (a few hundred
  bytes), never a join.

Reference: the reference repo (Lucew/changepoynt) has no tokenizer; this
operator exists for the north-rule training-data pipeline (pre-tokenized
sequences).  Provenance: Sennrich et al. 2016 (BPE), Gage 1994.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changepoynt_spark.sources.datagen import VOCAB

SEP = '\x1f'   # symbol separator (unit separator)
EOW = '\x17'   # end-of-word marker symbol (ETB)


def _delimited(col, per_word: bool):
    """Char-level SEP-delimited symbol stream.  ``per_word``: col is a bare
    word (append one EOW); else col is full document text (every space
    becomes an EOW symbol, plus one trailing EOW for the last word).
    '(?s)' so stray newlines are split like any char on both regex engines;
    the produced string carries a trailing SEP — harmless for matching,
    dropped by the empty-token filter after the final split."""
    if per_word:
        s = F.concat(col, F.lit(EOW))
    else:
        s = F.replace(F.concat(col, F.lit(' ')), F.lit(' '), F.lit(EOW))
    return F.regexp_replace(s, '(?s)(.)', '$1' + SEP)


def _apply_merges(repr_col, merges):
    for m in merges:
        lhs, rhs = m['lhs'], m['rhs']
        repr_col = F.replace(repr_col, F.lit(lhs + SEP + rhs), F.lit(lhs + rhs))
    return repr_col


def _symbols(repr_col):
    return F.filter(F.split(repr_col, SEP), lambda t: t != F.lit(''))


# -- SQL-string twins of the learning-loop expressions -----------------------
#
# The learners rebuild their pair-count expression every round; constructing
# it Column-by-Column costs hundreds of py4j round trips per round (measured
# ~0.1 s/round of pure driver chatter).  Building the SAME expression as one
# SQL string and parsing it with a single F.expr() call removes that driver
# tax; the parsed plans are identical to the Column forms (same functions,
# same tie-breaks), so the learned merge tables cannot differ.

def _sql_str(s: str) -> str:
    """Single-quoted Spark-SQL string literal (escapes backslash/quote;
    the SEP/EOW control characters are legal raw inside a literal)."""
    return "'" + s.replace('\\', '\\\\').replace("'", "\\'") + "'"


def _apply_merges_sql(src: str, merges) -> str:
    """Chained literal replaces over ``src`` (a SQL expression string) —
    the string twin of :func:`_apply_merges`."""
    for m in merges:
        src = (f"replace({src}, {_sql_str(m['lhs'] + SEP + m['rhs'])}, "
               f"{_sql_str(m['lhs'] + m['rhs'])})")
    return src


def _pairs_sql(src: str) -> str:
    """Adjacent-pair structs of the symbol stream ``src`` — the string twin
    of ``_pair_structs(_symbols(...))`` (NULL when fewer than 2 symbols)."""
    syms = f"filter(split({src}, {_sql_str(SEP)}), t -> t != '')"
    return (f"CASE WHEN size({syms}) >= 2 THEN "
            f"transform(sequence(1, size({syms}) - 1), "
            f"i -> struct(element_at({syms}, i) AS lhs, "
            f"element_at({syms}, i + 1) AS rhs)) END")


def _spread_input(df: DataFrame) -> DataFrame:
    """Spread an under-partitioned corpus scan across the cores for the one
    explode+count pass (test parquet is single-split; at cluster scale the
    scan already carries >= cores splits and this is a no-op).  Used by the
    classic learner only: its per-word explode is CPU-bound; the windowed
    learner's build measured FASTER without the extra local shuffle."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def _sized_parts(n_rows: int, df: DataFrame, target: int = 2048,
                 floor: int = 1) -> int:
    """Partition count for the cached learning table, derived from its SIZE
    (~``target`` rows per task, capped at session cores) — replaces the
    round-8 ``coalesce(8)`` literal, which serialized the hottest loop onto
    8 tasks no matter the input (the one scale-killer flagged in VERDICT
    r8).  A 31-row classic vocab collapses to 1 task; a multi-million-row
    distinct-window table at corpus scale gets the full cluster (measured
    at sf0.1: fewer, fuller tasks beat 31 near-empty ones — the floor/
    target keep the small-input behavior while letting big inputs scale)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return min(par, max(floor, -(-int(n_rows) // target)))


MERGE_SCHEMA = T.StructType([
    T.StructField('merge_rank', T.IntegerType(), False),
    T.StructField('lhs', T.StringType(), False),
    T.StructField('rhs', T.StringType(), False),
    T.StructField('merged', T.StringType(), False),
    T.StructField('pair_count', T.LongType(), False),
])


def learn_bpe_merges(df: DataFrame, n_merges: int = 16,
                     text_col: str = 'text') -> list:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns a list of
    dicts (merge_rank 1-based, lhs, rhs, merged, pair_count) in application
    order.  Stops early if the corpus runs out of adjacent pairs.

    Each round's pair count is an aggregate a SQL engine can replicate, so
    the learned table itself is oracle-checkable (the doc_bpe_merges
    contract query unrolls the rounds as chained DuckDB CTEs)."""
    if n_merges < 1:
        raise ValueError('n_merges must be >= 1')
    wc = (_spread_input(df)
          .select(F.explode(F.split(F.col(text_col), ' ')).alias('word'))
          .groupBy('word').agg(F.count('*').alias('cnt'))
          .withColumn('repr', _delimited(F.col('word'), per_word=True)))
    wc = wc.persist()
    try:
        n_words = wc.count()
        # the cache keeps the groupBy's full shuffle partitioning; for a
        # vocabulary-bounded table that is mostly empty tasks EVERY round —
        # read it through a narrow data-sized coalesce instead
        parts = _sized_parts(n_words, wc)
        loop = wc.coalesce(parts) if parts < wc.rdd.getNumPartitions() else wc
        merges: list = []
        for rank in range(1, n_merges + 1):
            pairs = F.expr(_pairs_sql(_apply_merges_sql('repr', merges)))
            best = (loop.select('cnt', F.explode(pairs).alias('p'))
                        .groupBy('p.lhs', 'p.rhs')
                        .agg(F.sum('cnt').alias('pair_count'))
                        .orderBy(F.col('pair_count').desc(),
                                 F.col('lhs').asc(), F.col('rhs').asc())
                        .take(1))
            if not best:
                break
            row = best[0]
            merges.append({'merge_rank': rank, 'lhs': row['lhs'],
                           'rhs': row['rhs'],
                           'merged': row['lhs'] + row['rhs'],
                           'pair_count': int(row['pair_count'])})
        return merges
    finally:
        wc.unpersist()


def bpe_merges(df: DataFrame, n_merges: int = 16,
               text_col: str = 'text') -> DataFrame:
    """The learned merge table as a DataFrame (merge_rank, lhs, rhs, merged,
    pair_count) — the contract-query face of :func:`learn_bpe_merges`."""
    spark = df.sparkSession
    merges = learn_bpe_merges(df, n_merges=n_merges, text_col=text_col)
    return spark.createDataFrame(
        [(m['merge_rank'], m['lhs'], m['rhs'], m['merged'], m['pair_count'])
         for m in merges], MERGE_SCHEMA)


def bpe_tokenize(df: DataFrame, merges=None, n_merges: int = 16,
                 id_col: str = 'doc_id', text_col: str = 'text',
                 vocab: int = VOCAB, with_roundtrip: bool = False) -> DataFrame:
    """documents -> (doc_id, tokens array<string>, token_ids array<int>,
    n_bpe int, source): greedy ordered-replace BPE over the learned (or
    supplied) merge table.  token_ids use the engine-portable md5 formula
    of text.tokenize_documents(hash_fn='md5') so the id stream is
    cross-engine checkable.  Zero-shuffle map: merges are plan literals.

    ``with_roundtrip=True`` adds a boolean ``roundtrip`` audit column
    (detokenized tokens == original text) computed in the SAME scan — the
    losslessness proof you want riding along at 100 TB, not a second pass."""
    if merges is None:
        merges = learn_bpe_merges(df, n_merges=n_merges, text_col=text_col)
    applied = _apply_merges(_delimited(F.col(text_col), per_word=False),
                            merges)
    toks = _symbols(applied)
    tok_id = lambda t: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast('long'),
        F.lit(vocab)).cast('int')
    carry = ['source'] if 'source' in df.columns else []
    cols = [F.col(id_col).cast('string').alias(id_col),
            toks.alias('tokens')]
    if with_roundtrip:
        # merges only ever delete separators, so stripping SEP and mapping
        # EOW back to ' ' must reproduce text||' ' byte-for-byte
        cols.append(
            (F.replace(F.replace(applied, F.lit(SEP), F.lit('')),
                       F.lit(EOW), F.lit(' '))
             == F.concat(F.col(text_col), F.lit(' '))).alias('roundtrip'))
    out = df.select(*cols, *carry)
    mid = ['tokens',
           F.transform('tokens', tok_id).alias('token_ids'),
           F.size('tokens').cast('int').alias('n_bpe')]
    if with_roundtrip:
        mid.append('roundtrip')
    return out.select(id_col, *mid, *carry)


def bpe_detokenize(df: DataFrame, id_col: str = 'doc_id',
                   tokens_col: str = 'tokens') -> DataFrame:
    """(doc_id, text) — byte-exact inverse of :func:`bpe_tokenize` for any
    input text that does not itself contain SEP/EOW/trailing spaces (the
    stated contract): merges only ever deleted separators, so concatenating
    the tokens and turning EOW markers back into spaces restores the
    original bytes."""
    glued = F.replace(F.concat_ws('', F.col(tokens_col)),
                      F.lit(EOW), F.lit(' '))
    return df.select(
        F.col(id_col).alias(id_col),
        F.substr(glued, F.lit(1), F.length(glued) - 1).alias('text'))


# -- windowed (cross-word) BPE at realistic vocab size -----------------------
#
# The synthetic documents corpus has a 31-word vocabulary, so classic
# per-word BPE EXHAUSTS after 82 merges (measured; see BENCH/R7_NOTES.md) —
# no amount of batching reaches a realistic merge count.  The windowed
# variant lifts the end-of-word barrier GPT-2-style: merges may span word
# boundaries, but only within aligned non-overlapping W-word windows (the
# pre-tokenization unit becomes the window, exactly as the word was before).
# The pair space then grows with word SEQUENCES, supporting 1k+ merges.
#
# Scale shape: the counting table is the DISTINCT-window table (bounded by
# distinct W-grams, not corpus size) — the same role the distinct-word table
# plays for classic BPE.  Learning is BATCHED: each round counts pairs once
# and accepts a rank-ordered batch, so K merges cost ~K/batch shuffles
# instead of K.  Two batch modes, both deterministic:
#   'rank' (contract default): the top `batch` pairs land in one round and
#     apply in rank order.  Within a round, recorded pair_counts are as-of
#     round start; where a higher-ranked replace consumed an occurrence the
#     lower-ranked replace simply matches less — well-defined under ordered
#     literal replaces, and a plain ORDER BY ... LIMIT in the SQL twin.
#   'independent': greedy rank scan that skips a pair if either symbol
#     collides with a symbol (or merged output) of a pair already accepted
#     this round — closer to sequential BPE per merge, but acceptance per
#     round is corpus-dependent (8-50 measured here), so reaching a fixed
#     vocab takes an input-dependent round count.
# Application is a broadcast join of the learned window→symbols table —
# documents never see a K-deep expression.
#
# Both learning and application remain DuckDB-expressible (recursive-CTE
# greedy selection + chained round CTEs), so the driver oracle checks the
# full 1k-merge pipeline end to end.


def _word_windows(text_col, window: int):
    """Non-overlapping aligned W-word windows of a document, as strings
    (space-joined).  The last window may be shorter.  Concatenating the
    windows' delimited streams (each :func:`_delimited` doc-style, i.e. an
    EOW symbol after every word) reproduces the document's full delimited
    stream byte-for-byte."""
    words = F.split(text_col, ' ')
    n = F.floor((F.size(words) + F.lit(window - 1)) / F.lit(window)) \
         .cast('int')
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(words, i * window + 1, window), ' '))


def _pair_structs(syms):
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias('lhs'),
                F.element_at(syms, i + 1).alias('rhs'))))


def learn_bpe_merges_windowed(df: DataFrame, n_rounds: int = 18,
                              batch: int = 64, candidates: int = 2048,
                              window: int = 4, text_col: str = 'text',
                              mode: str = 'rank'):
    """Batched windowed BPE learning.  Returns ``(merges, window_reprs)``:
    ``merges`` is the global-rank-ordered list of merge dicts (merge_rank,
    lhs, rhs, merged, pair_count — pair_count as of its round's start), and
    ``window_reprs`` is the distinct-window table (chunk, cnt, repr) with
    every learned merge applied — the application vocabulary, persisted
    (caller unpersists).

    Per round: ONE pair-count aggregate over the cached distinct-window
    table, a driver-side rank scan (bounded, deterministic: ties broken
    (count DESC, lhs, rhs)), then the accepted batch applied as chained
    literal replaces.  ``mode='rank'`` accepts the top ``batch`` pairs
    outright (n_rounds * batch merges guaranteed while pairs last);
    ``mode='independent'`` greedily skips pairs colliding with an earlier
    acceptance this round (blocked = accepted lhs/rhs/merged strings),
    scanning up to ``candidates`` pairs.  Driver traffic is ≤
    ``candidates`` rows per round."""
    assert mode in ('rank', 'independent'), mode
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        # single-split test parquet: spread the window-explode pass over a
        # few tasks (par/4 measured best at sf0.1 — full-width repartition
        # pays more in shuffle overhead than the tiny corpus saves; at
        # cluster scale the scan has >= cores splits and this is a no-op)
        df = df.repartition(max(2, par // 4))
    rep0 = (df.select(F.explode(_word_windows(F.col(text_col),
                                              window)).alias('chunk'))
              .groupBy('chunk').agg(F.count('*').alias('cnt'))
              .withColumn('repr', _delimited(F.col('chunk'), per_word=False))
              .persist())
    n_chunks = rep0.count()
    # data-sized parallelism for the hot per-round loop (replaces the r8
    # coalesce(8) literal): ~8k distinct windows per task, floor 8 (the
    # measured sweet spot at sf0.1), capped at the session's cores — a
    # corpus-scale distinct-window table gets the whole cluster instead of
    # 8 serialized tasks
    parts = _sized_parts(n_chunks, rep0, target=8192, floor=8)
    rep = (rep0.coalesce(parts) if parts < rep0.rdd.getNumPartitions()
           else rep0.repartition(parts)).localCheckpoint(eager=True)
    rep0.unpersist()
    merges: list = []
    retired: list = []   # generations awaiting their successor's materialization
    for _ in range(n_rounds):
        cand = (rep.select('cnt', F.explode(F.expr(_pairs_sql('repr')))
                                   .alias('p'))
                   .groupBy('p.lhs', 'p.rhs')
                   .agg(F.sum('cnt').alias('pair_count'))
                   .orderBy(F.col('pair_count').desc(),
                            F.col('lhs').asc(), F.col('rhs').asc())
                   .take(batch if mode == 'rank' else candidates))
        # that take() materialized rep's (lazy) checkpoint, so the
        # generation BEFORE it no longer backs anything — release it now
        while retired:
            retired.pop().unpersist()
        accepted, blocked = [], set()
        for row in cand:
            l, r = row['lhs'], row['rhs']
            if mode == 'independent' and (l in blocked or r in blocked):
                continue
            accepted.append({'merge_rank': len(merges) + len(accepted) + 1,
                             'lhs': l, 'rhs': r, 'merged': l + r,
                             'pair_count': int(row['pair_count'])})
            blocked.update((l, r, l + r))
            if len(accepted) == batch:
                break
        if not accepted:
            break
        # localCheckpoint, not persist: it truncates the LOGICAL plan too,
        # so round k+1's analysis starts from a leaf instead of re-walking
        # k*batch accumulated replace expressions (O(K^2) driver-side
        # catalyst work — measured minutes by round 18 with plain persist).
        # LAZY (eager=False): the next round's pair-count job materializes
        # it as a side effect, halving the Spark jobs per round; the parent
        # generation stays cached until then (released above).
        new = rep.withColumn(
            'repr', F.expr(_apply_merges_sql('repr', accepted))) \
            .localCheckpoint(eager=False)
        retired.append(rep)
        rep = new
        merges += accepted
    if retired:
        # the final generation is still a lazy checkpoint: materialize it so
        # the last retired generation's blocks can be released before return
        rep.count()
        while retired:
            retired.pop().unpersist()
    return merges, rep


def bpe_merges_windowed(df: DataFrame, n_rounds: int = 18, batch: int = 64,
                        candidates: int = 2048, window: int = 4,
                        text_col: str = 'text',
                        mode: str = 'rank') -> DataFrame:
    """The windowed learned merge table as a DataFrame — the contract-query
    face of :func:`learn_bpe_merges_windowed`."""
    spark = df.sparkSession
    merges, rep = learn_bpe_merges_windowed(
        df, n_rounds=n_rounds, batch=batch, candidates=candidates,
        window=window, text_col=text_col, mode=mode)
    rep.unpersist()
    return spark.createDataFrame(
        [(m['merge_rank'], m['lhs'], m['rhs'], m['merged'], m['pair_count'])
         for m in merges], MERGE_SCHEMA)


def bpe_tokenize_windowed(df: DataFrame, merges=None, window_reprs=None,
                          n_rounds: int = 18, batch: int = 64,
                          candidates: int = 2048, window: int = 4,
                          id_col: str = 'doc_id', text_col: str = 'text',
                          vocab: int = VOCAB, mode: str = 'rank',
                          with_roundtrip: bool = False) -> DataFrame:
    """documents -> (doc_id, tokens, token_ids, n_bpe[, roundtrip], source)
    under the windowed merge table: each document's aligned W-word windows
    are looked up in the learned window→symbol-stream table (a BROADCAST
    join — the window table is the bounded vocabulary) and reassembled in
    window order.  No K-deep replace chain ever touches the corpus; the
    reassembly is the one exchange (groupBy doc_id).

    ``window_reprs`` (from :func:`learn_bpe_merges_windowed`) is reused
    when given; otherwise it is rebuilt from ``merges`` in ``batch``-sized
    stages, or learned from scratch."""
    own = False
    if window_reprs is None:
        if merges is None:
            merges, window_reprs = learn_bpe_merges_windowed(
                df, n_rounds=n_rounds, batch=batch, candidates=candidates,
                window=window, text_col=text_col, mode=mode)
            own = True
        else:
            window_reprs = (
                df.select(F.explode(_word_windows(F.col(text_col),
                                                  window)).alias('chunk'))
                  .distinct()
                  .withColumn('repr',
                              _delimited(F.col('chunk'), per_word=False)))
            for i in range(0, len(merges), batch):
                window_reprs = window_reprs.withColumn(
                    'repr',
                    _apply_merges(F.col('repr'), merges[i:i + batch])) \
                    .localCheckpoint(eager=True)   # truncate, as in learning
                own = True
    carry = ['source'] if 'source' in df.columns else []
    ch = df.select(F.col(id_col).cast('string').alias(id_col),
                   F.col(text_col).alias('_text'), *carry,
                   F.posexplode(_word_windows(F.col(text_col), window))
                    .alias('_pos', 'chunk'))
    j = ch.join(F.broadcast(window_reprs.select('chunk', 'repr')), 'chunk')
    agg = [F.first('_text').alias('_text'),
           F.concat_ws('', F.transform(
               F.array_sort(F.collect_list(F.struct('_pos', 'repr'))),
               lambda s: s['repr'])).alias('_applied')]
    agg += [F.first(c).alias(c) for c in carry]
    per_doc = j.groupBy(id_col).agg(*agg)
    toks = _symbols(F.col('_applied'))
    tok_id = lambda t: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast('long'),
        F.lit(vocab)).cast('int')
    cols = [F.col(id_col),
            toks.alias('tokens'),
            F.transform(toks, tok_id).alias('token_ids'),
            F.size(toks).cast('int').alias('n_bpe')]
    if with_roundtrip:
        cols.append(
            (F.replace(F.replace(F.col('_applied'), F.lit(SEP), F.lit('')),
                       F.lit(EOW), F.lit(' '))
             == F.concat(F.col('_text'), F.lit(' '))).alias('roundtrip'))
    out = per_doc.select(*cols, *carry)
    if own:
        window_reprs.unpersist()
    return out


def write_merge_table(spark, root: str, merges,
                      properties: dict = None) -> dict:
    """Persist a learned merge table as an Icebergish artifact (one
    snapshot, ordered by merge_rank) so tokenization jobs can load the
    SAME vocabulary without relearning — the tokenizer-artifact step of a
    training-data pipeline.  Returns the snapshot dict."""
    from changepoynt_spark.sources.tables import IcebergishTable
    t = IcebergishTable(root)
    df = spark.createDataFrame(
        [(m['merge_rank'], m['lhs'], m['rhs'], m['merged'], m['pair_count'])
         for m in merges], MERGE_SCHEMA)
    return t.append(df.coalesce(1), partition_by=(),
                    properties={**(properties or {}),
                                'artifact': 'bpe-merges',
                                'n_merges': len(merges)})


def read_merge_table(spark, root: str) -> list:
    """Load a merge table written by :func:`write_merge_table`, in
    application (merge_rank) order."""
    from changepoynt_spark.sources.tables import IcebergishTable
    rows = (IcebergishTable(root).read(spark)
            .orderBy('merge_rank').collect())
    return [{'merge_rank': r['merge_rank'], 'lhs': r['lhs'],
             'rhs': r['rhs'], 'merged': r['merged'],
             'pair_count': r['pair_count']} for r in rows]
