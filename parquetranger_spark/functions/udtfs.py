"""Python user-defined table functions — the Spark 4 surface for
"one input row → N output rows with imperative per-row logic".

A UDTF plans as a generator stage consumed through a LATERAL join: the
per-row Python runs executor-side over streamed batches, composes with
any downstream DataFrame/SQL plan, and never touches the driver — the
scale-safe home for sequential text scans that neither built-in
functions (no cross-element state) nor ``explode`` (no run tracking)
can express. Arrow-optimized (``useArrow=True``) so batches cross the
JVM↔Python boundary columnar, not pickled row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from ..serde import pickle_module_by_value

# the UDTF class ships to executor Python workers, which do not have the
# (non-pip-installed) repo on sys.path — make its pickle self-contained
pickle_module_by_value(__name__)


class _WordRuns:
    """Maximal runs of identical adjacent whitespace-delimited words of
    length ≥ 2 — the repetition artifact (stutter loops, copy-paste
    expansion) corpus-quality filters flag. Sequential single-pass scan
    per document; emits (word, run_len) per maximal run.

    Semantics pinned to ``split(text, ' ')`` (single-space, empties
    preserved) so the DuckDB gaps-and-islands oracle reproduces runs
    exactly, including runs of the empty token from repeated spaces.
    """

    def eval(self, text):
        if not text:
            return
        prev = None
        run = 0
        for w in text.split(" "):
            if w == prev:
                run += 1
            else:
                if run >= 2:
                    yield (prev, run)
                prev, run = w, 1
        if run >= 2:
            yield (prev, run)


word_runs = udtf(_WordRuns, returnType="word string, run_len int", useArrow=True)
