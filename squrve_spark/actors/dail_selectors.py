"""DAIL-SQL few-shot example selectors: the full 10-type registry.

Reference analog (algorithm shape, not code): the ``SELECTOR_TYPE`` registry
and selector classes in /root/reference/core/actor/generator/
DAILSQLGenerate.py:344-354 (type names), 1437-1740 (classes), 1805-1828
(dispatch). The reference ranks training examples by embedding distance of
the (optionally schema-masked) question, excludes same-question rows and —
under ``cross_domain`` — same-database rows, and in the skeleton variants
additionally gates or re-ranks by SQL-skeleton similarity with a backfill
pass so ``num_example`` is always met when the pool allows. Several
reference classes degrade to random vectors when no embedding model is
installed; here every type is DETERMINISTIC: questions embed through the
same feature-hash vectors the schema index uses
(``squrve_spark.index._features_stable``), so orderings are reproducible
across processes with no model download.

Selector semantics (distance = Euclidean between unit vectors, so the
ordering is the reverse cosine ordering; ties break by pool position):

* ``RANDOM``                — seeded sample (reference seeds ``random`` with 0).
* ``COSSIMILAR``            — cosine similarity, descending.
* ``EUCDISTANCE``           — distance ascending on the raw question.
* ``EUCDISTANCETHRESHOLD``  — distance ascending, candidates past
  ``dist_threshold`` excluded first, backfilled by distance if short.
* ``EUCDISSKLSIMTHR``       — masked-question distance + GOLD-skeleton
  similarity >= ``skl_threshold`` gate with backfill (ref threshold 0.85).
* ``EUCDISQUESTIONMASK``    — masked-question distance ascending (the
  paper's headline configuration).
* ``EUCDISPRESKLSIMTHR``    — raw-question distance + PREDICTED-SQL
  skeleton gate with backfill (needs ``target["pre_sql"]``).
* ``EUCDISPRESKLSIMPLUS``   — no gate: rank by distance plus
  ``(1 - skeleton_similarity)`` as an additive penalty.
* ``EUCDISMASKPRESKLSIMTHR``      — masked distance + predicted-skeleton
  gate with backfill.
* ``EUCDISMASKPRESKLSIMTHRSHIFT`` — same signals, but instead of a hard
  gate the below-threshold candidates are SHIFTED after the passing ones
  (stable within each block), never dropped.

Driver-side by design: example pools are 10^2-10^5 rows (the reference holds
them in memory too); at corpus scale the same ranking runs as a Spark join
through ``operators/similarity.py`` (see ``index.ColumnIndex.to_df``).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence

import numpy as np

from squrve_spark.actors.named import sql_skeleton
from squrve_spark.fewshot import jaccard, mask_question, tokenize
from squrve_spark.index import _features_stable

_DIM = 256


class SELECTOR_TYPE:
    """String constants exactly as the reference spells them
    (DAILSQLGenerate.py:344-354)."""

    COS_SIMILAR = "COSSIMILAR"
    RANDOM = "RANDOM"
    EUC_DISTANCE = "EUCDISTANCE"
    EUC_DISTANCE_THRESHOLD = "EUCDISTANCETHRESHOLD"
    EUC_DISTANCE_SKELETON_SIMILARITY_THRESHOLD = "EUCDISSKLSIMTHR"
    EUC_DISTANCE_QUESTION_MASK = "EUCDISQUESTIONMASK"
    EUC_DISTANCE_PRE_SKELETON_SIMILARITY_THRESHOLD = "EUCDISPRESKLSIMTHR"
    EUC_DISTANCE_PRE_SKELETON_SIMILARITY_PLUS = "EUCDISPRESKLSIMPLUS"
    EUC_DISTANCE_MASK_PRE_SKELETON_SIMILARITY_THRESHOLD = "EUCDISMASKPRESKLSIMTHR"
    EUC_DISTANCE_MASK_PRE_SKELETON_SIMILARITY_THRESHOLD_SHIFT = (
        "EUCDISMASKPRESKLSIMTHRSHIFT"
    )


def _embed(texts: Sequence[str]) -> np.ndarray:
    if not texts:
        return np.zeros((0, _DIM))
    return np.stack([_features_stable(t, _DIM) for t in texts])


def _masked_text(question: str, schema_terms: Optional[set[str]]) -> str:
    if not schema_terms:
        return " ".join(tokenize(question))
    return " ".join(mask_question(question, schema_terms))


def _example_sql(ex: dict) -> str:
    return ex.get("sql") or ex.get("query") or ""


class BasicExampleSelector:
    """Shared pool bookkeeping (ref DAILSQLGenerate.py:1437-1455).

    ``pool`` rows are dicts with at least ``question``; ``sql``/``query``,
    ``db_id`` and ``schema_terms`` participate when present.
    """

    uses_mask = False  # subclasses embedding the MASKED question set True

    def __init__(
        self,
        pool: list[dict],
        schema_terms: Optional[set[str]] = None,
        dist_threshold: float = 1.5,
        skl_threshold: float = 0.85,
    ):
        self.pool = list(pool)
        self.schema_terms = schema_terms or set()
        self.dist_threshold = dist_threshold
        self.skl_threshold = skl_threshold
        texts = [
            _masked_text(ex.get("question", ""), self.schema_terms)
            if self.uses_mask
            else ex.get("question", "")
            for ex in self.pool
        ]
        self.matrix = _embed(texts)

    # -- candidate machinery ------------------------------------------------
    def _target_vec(self, target: dict) -> np.ndarray:
        q = target.get("question", "")
        text = _masked_text(q, self.schema_terms) if self.uses_mask else q
        return _features_stable(text, _DIM)

    def _admissible(self, target: dict, cross_domain: bool) -> list[int]:
        out = []
        for i, ex in enumerate(self.pool):
            if ex.get("question") == target.get("question"):
                continue  # never hand the model its own row (ref :1496)
            if cross_domain and ex.get("db_id") == target.get("db_id"):
                continue
            out.append(i)
        return out

    def _by_distance(self, target: dict, cross_domain: bool) -> list[tuple[float, int]]:
        idx = self._admissible(target, cross_domain)
        if not idx:
            return []
        v = self._target_vec(target)
        d = np.linalg.norm(self.matrix[idx] - v, axis=1)
        return sorted(zip(d.tolist(), idx), key=lambda p: (p[0], p[1]))

    def _skeleton_sim(self, target: dict, ex: dict, use_pre: bool) -> float:
        t_sql = target.get("pre_sql", "") if use_pre else target.get("query", "")
        return jaccard(sql_skeleton(t_sql), sql_skeleton(_example_sql(ex)))

    def _gate_with_backfill(
        self,
        ranked: list[tuple[float, int]],
        passes,
        num_example: int,
    ) -> list[dict]:
        """Take passing candidates in rank order; if short of
        ``num_example``, append the skipped ones in the same order
        (ref's second loop, DAILSQLGenerate.py:1598-1609)."""
        chosen = [i for _d, i in ranked if passes(i)][:num_example]
        if len(chosen) < num_example:
            for _d, i in ranked:
                if i not in chosen:
                    chosen.append(i)
                    if len(chosen) >= num_example:
                        break
        return [self.pool[i] for i in chosen]

    def get_examples(
        self, target: dict, num_example: int, cross_domain: bool = False
    ) -> list[dict]:
        raise NotImplementedError


class RandomExampleSelector(BasicExampleSelector):
    def get_examples(self, target, num_example, cross_domain=False):
        idx = self._admissible(target, cross_domain)
        rng = random.Random(0)  # reference seeds 0 (ref :1460)
        return [self.pool[i] for i in rng.sample(idx, min(num_example, len(idx)))]


class CosineSimilarExampleSelector(BasicExampleSelector):
    def get_examples(self, target, num_example, cross_domain=False):
        idx = self._admissible(target, cross_domain)
        if not idx:
            return []
        v = self._target_vec(target)
        sims = (self.matrix[idx] @ v).tolist()
        ranked = sorted(zip(sims, idx), key=lambda p: (-p[0], p[1]))
        return [self.pool[i] for _s, i in ranked[:num_example]]


class EuclideanDistanceSelector(BasicExampleSelector):
    def get_examples(self, target, num_example, cross_domain=False):
        ranked = self._by_distance(target, cross_domain)
        return [self.pool[i] for _d, i in ranked[:num_example]]


class EuclideanDistanceThresholdSelector(BasicExampleSelector):
    def get_examples(self, target, num_example, cross_domain=False):
        ranked = self._by_distance(target, cross_domain)
        near = {i for d, i in ranked if d <= self.dist_threshold}
        return self._gate_with_backfill(ranked, near.__contains__, num_example)


class EuclideanDistanceSkeletonSimilarityThresholdSelector(BasicExampleSelector):
    uses_mask = True

    def get_examples(self, target, num_example, cross_domain=False):
        ranked = self._by_distance(target, cross_domain)
        return self._gate_with_backfill(
            ranked,
            lambda i: self._skeleton_sim(target, self.pool[i], use_pre=False)
            >= self.skl_threshold,
            num_example,
        )


class EuclideanDistanceQuestionMaskSelector(BasicExampleSelector):
    uses_mask = True

    def get_examples(self, target, num_example, cross_domain=False):
        ranked = self._by_distance(target, cross_domain)
        return [self.pool[i] for _d, i in ranked[:num_example]]


class EuclideanDistancePreSkeletonSimilarityThresholdSelector(BasicExampleSelector):
    def get_examples(self, target, num_example, cross_domain=False):
        ranked = self._by_distance(target, cross_domain)
        return self._gate_with_backfill(
            ranked,
            lambda i: self._skeleton_sim(target, self.pool[i], use_pre=True)
            >= self.skl_threshold,
            num_example,
        )


class EuclideanDistancePreSkeletonSimilarityPlusSelector(BasicExampleSelector):
    def get_examples(self, target, num_example, cross_domain=False):
        ranked = self._by_distance(target, cross_domain)
        blended = sorted(
            (
                (d + (1.0 - self._skeleton_sim(target, self.pool[i], use_pre=True)), i)
                for d, i in ranked
            ),
            key=lambda p: (p[0], p[1]),
        )
        return [self.pool[i] for _s, i in blended[:num_example]]


class EuclideanDistanceMaskPreSkeletonSimilarityThresholdSelector(
    EuclideanDistancePreSkeletonSimilarityThresholdSelector
):
    uses_mask = True


class EuclideanDistanceMaskPreSkeletonSimilarityThresholdShiftSelector(
    BasicExampleSelector
):
    uses_mask = True

    def get_examples(self, target, num_example, cross_domain=False):
        ranked = self._by_distance(target, cross_domain)
        passing = [
            (d, i)
            for d, i in ranked
            if self._skeleton_sim(target, self.pool[i], use_pre=True)
            >= self.skl_threshold
        ]
        failing = [p for p in ranked if p not in passing]
        shifted = passing + failing
        return [self.pool[i] for _d, i in shifted[:num_example]]


_SELECTORS: dict[str, type[BasicExampleSelector]] = {
    SELECTOR_TYPE.COS_SIMILAR: CosineSimilarExampleSelector,
    SELECTOR_TYPE.RANDOM: RandomExampleSelector,
    SELECTOR_TYPE.EUC_DISTANCE: EuclideanDistanceSelector,
    SELECTOR_TYPE.EUC_DISTANCE_THRESHOLD: EuclideanDistanceThresholdSelector,
    SELECTOR_TYPE.EUC_DISTANCE_SKELETON_SIMILARITY_THRESHOLD: (
        EuclideanDistanceSkeletonSimilarityThresholdSelector
    ),
    SELECTOR_TYPE.EUC_DISTANCE_QUESTION_MASK: EuclideanDistanceQuestionMaskSelector,
    SELECTOR_TYPE.EUC_DISTANCE_PRE_SKELETON_SIMILARITY_THRESHOLD: (
        EuclideanDistancePreSkeletonSimilarityThresholdSelector
    ),
    SELECTOR_TYPE.EUC_DISTANCE_PRE_SKELETON_SIMILARITY_PLUS: (
        EuclideanDistancePreSkeletonSimilarityPlusSelector
    ),
    SELECTOR_TYPE.EUC_DISTANCE_MASK_PRE_SKELETON_SIMILARITY_THRESHOLD: (
        EuclideanDistanceMaskPreSkeletonSimilarityThresholdSelector
    ),
    SELECTOR_TYPE.EUC_DISTANCE_MASK_PRE_SKELETON_SIMILARITY_THRESHOLD_SHIFT: (
        EuclideanDistanceMaskPreSkeletonSimilarityThresholdShiftSelector
    ),
}

ALL_SELECTOR_TYPES: tuple[str, ...] = tuple(_SELECTORS)


def get_example_selector(selector_type: str) -> type[BasicExampleSelector]:
    """Name -> class, raising on unknown names like the reference dispatch
    (DAILSQLGenerate.py:1805-1828)."""
    try:
        return _SELECTORS[selector_type]
    except KeyError:
        raise ValueError(f"{selector_type} is not supported yet") from None
