"""Text-analysis Ray pipelines: wire the vectorized kernels in
functions/textstats.py as dataset stages (language-ID, quality scoring,
token counting, fingerprinting)."""

from __future__ import annotations

import pyarrow as pa


class TextAnalysisStage:
    """Actor-pool stage adding langid/quality/token-count/fingerprint
    columns (regexes + stopword tables compiled once per actor)."""

    def __init__(self, text_col: str = "text", features: tuple = ("all",)):
        # import here so each actor pays setup once
        from quickwit_ray.functions import textstats as ts

        self.ts = ts
        self.text_col = text_col
        self.features = set(features)

    def _want(self, f: str) -> bool:
        return "all" in self.features or f in self.features

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out = batch
        if self._want("langid"):
            out = out.append_column("lang_pred",
                                    pa.array(self.ts.detect_language(texts), pa.string()))
        if self._want("tokens"):
            out = out.append_column("n_tokens",
                                    pa.array(self.ts.token_counts(texts), pa.int64()))
        if self._want("quality"):
            q = self.ts.quality_scores(texts)
            for name in ("n_words", "mean_word_len", "stopword_ratio",
                         "punct_ratio", "quality_score"):
                out = out.append_column(name, pa.array(q[name]))
        if self._want("fingerprint"):
            out = out.append_column("fingerprint",
                                    pa.array(self.ts.fingerprints(texts), pa.uint64()))
        return out


def analyze_text(ds, text_col: str = "text", features: tuple = ("all",),
                 concurrency: int = 4, batch_size: int = 2048):
    return ds.map_batches(
        TextAnalysisStage,
        fn_constructor_kwargs=dict(text_col=text_col, features=features),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
