"""BLAST top-hit baseline.

Reference: protnote/models/blast.py:16-158 + bin/run_blast.py — wraps the
NCBI ``makeblastdb``/``blastp`` binaries, keeps the top bit-score hit per
query, transfers the hit's GO labels, and pivots to a ±15 pseudo-logit
matrix.  Here the subprocess invocation is direct (no Biopython wrapper) and
gated on the binaries being present; parsing is pandas-vectorised.
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from protnote_tpu.data.fasta import read_fasta, save_to_fasta

logger = logging.getLogger(__name__)

PSEUDO_LOGIT = 15.0  # hit labels -> +15, everything else -> -15


def blast_available() -> bool:
    return shutil.which("blastp") is not None and shutil.which("makeblastdb") is not None


class BlastTopHits:
    """Top-hit label transfer between a db FASTA and a query FASTA."""

    def __init__(self, db_fasta_path: str, queries_fasta_path: str,
                 work_dir: Optional[str] = None):
        self.db_fasta_path = db_fasta_path
        self.queries_fasta_path = queries_fasta_path
        self.work_dir = work_dir or os.path.dirname(os.path.abspath(db_fasta_path))
        self.db_path = os.path.join(self.work_dir, "blast_db")
        self.results_path = os.path.join(self.work_dir, "blast_results.tsv")
        self.timings: Dict[str, float] = {}

    def make_db(self) -> None:
        if not blast_available():
            raise RuntimeError("NCBI blast+ binaries not found on PATH")
        t0 = time.perf_counter()
        subprocess.run(
            ["makeblastdb", "-in", self.db_fasta_path, "-dbtype", "prot",
             "-out", self.db_path],
            check=True, capture_output=True,
        )
        self.timings["makeblastdb"] = time.perf_counter() - t0

    def _db_stale(self) -> bool:
        """An existing blast_db in work_dir may have been built from a
        DIFFERENT (or newer) FASTA — reusing it silently transfers labels
        from the wrong database.  A sidecar records the source path; the
        mtime check catches in-place FASTA updates."""
        pin = self.db_path + ".pin"
        src = self.db_path + ".src"
        if not os.path.exists(pin):
            return True
        if not os.path.exists(src):
            return True
        if open(src).read() != os.path.abspath(self.db_fasta_path):
            return True
        return os.path.getmtime(pin) < os.path.getmtime(self.db_fasta_path)

    def run_blast(self, num_threads: Optional[int] = None,
                  max_target_seqs: int = 1) -> str:
        if self._db_stale():
            self.make_db()
            with open(self.db_path + ".src", "w") as fh:
                fh.write(os.path.abspath(self.db_fasta_path))
        t0 = time.perf_counter()
        subprocess.run(
            ["blastp", "-query", self.queries_fasta_path, "-db", self.db_path,
             "-out", self.results_path, "-outfmt", "6",
             "-max_target_seqs", str(max_target_seqs),
             "-num_threads", str(num_threads or os.cpu_count() or 1)],
            check=True, capture_output=True,
        )
        self.timings["blastp"] = time.perf_counter() - t0
        return self.results_path

    def top_hits(self):
        """outfmt-6 TSV -> best hit per query by bit score (pandas)."""
        import pandas as pd

        cols = ["qseqid", "sseqid", "pident", "length", "mismatch", "gapopen",
                "qstart", "qend", "sstart", "send", "evalue", "bitscore"]
        try:
            # ids stay strings: type inference would parse numeric FASTA ids
            # as int64 and every db_labels/transferred lookup would miss
            df = pd.read_csv(self.results_path, sep="\t", names=cols,
                             dtype={"qseqid": str, "sseqid": str})
        except pd.errors.EmptyDataError:
            # no subject above threshold: queries keep all -15 pseudo-logits
            # (the documented contract), not a crash
            df = pd.DataFrame(columns=cols)
        df = df.sort_values("bitscore", ascending=False)
        return df.drop_duplicates(subset="qseqid", keep="first")

    def parse_results(self) -> Dict[str, List[str]]:
        """query id -> transferred labels of its best database hit."""
        t0 = time.perf_counter()
        db_labels = {
            seq_id: labels for _, seq_id, labels in read_fasta(self.db_fasta_path)
        }
        hits = self.top_hits()
        out = {
            q: db_labels.get(s, [])
            for q, s in zip(hits["qseqid"], hits["sseqid"])
        }
        self.timings["parse"] = time.perf_counter() - t0
        return out

    def pseudo_logits(self, label_vocabulary: List[str],
                      query_ids: Optional[List[str]] = None
                      ) -> Tuple[np.ndarray, List[str]]:
        """±15 logit matrix over the vocabulary (reference
        run_blast.py:98-146); queries without hits stay all -15."""
        transferred = self.parse_results()
        if query_ids is None:
            query_ids = [rid for _, rid, _ in read_fasta(self.queries_fasta_path)]
        label_idx = {l: j for j, l in enumerate(label_vocabulary)}
        logits = np.full((len(query_ids), len(label_vocabulary)), -PSEUDO_LOGIT,
                         dtype=np.float32)
        for i, qid in enumerate(query_ids):
            for label in transferred.get(qid, []):
                j = label_idx.get(label)
                if j is not None:
                    logits[i, j] = PSEUDO_LOGIT
        return logits, query_ids

    def save_timings(self, csv_path: str, num_queries: int) -> None:
        """Runtime CSV for the throughput comparison figure
        (reference run_blast.py:152-162)."""
        import pandas as pd

        row = {"num_queries": num_queries, **self.timings}
        df = pd.DataFrame([row])
        header = not os.path.exists(csv_path)
        df.to_csv(csv_path, mode="a", header=header, index=False)
