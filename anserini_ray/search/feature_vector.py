"""Sparse term->weight vector — port of the reference `FeatureVector`
(`J/util/FeatureVector.java:30-172`): add/accumulate, top-k prune (by weight
descending), L1/L2 norms and unit scaling, interpolation. float32 weights
like the reference."""

from __future__ import annotations

import numpy as np

F = np.float32


class FeatureVector:
    def __init__(self):
        self.features: dict[str, np.float32] = {}

    def add_feature_weight(self, term: str, weight) -> None:
        self.features[term] = F(self.features.get(term, F(0)) + F(weight))

    def get_feature_weight(self, term: str) -> np.float32:
        return self.features.get(term, F(0))

    def prune_to_size(self, k: int) -> "FeatureVector":
        # stable sort by weight descending (ties keep insertion order, like
        # Collections.sort over the insertion-ordered list)
        ordered = sorted(
            self.features.items(), key=lambda kv: -float(kv[1])
        )
        self.features = dict(ordered[:k])
        return self

    def l1(self) -> float:
        return float(sum(abs(float(v)) for v in self.features.values()))

    def l2(self) -> float:
        return float(
            np.sqrt(sum(float(v) ** 2 for v in self.features.values()))
        )

    def scale_to_unit_l1(self) -> "FeatureVector":
        norm = self.l1()
        if norm > 0:
            for t in self.features:
                self.features[t] = F(float(self.features[t]) / norm)
        return self

    @staticmethod
    def from_terms(terms) -> "FeatureVector":
        f = FeatureVector()
        for t in terms:
            f.add_feature_weight(t, 1.0)
        return f

    @staticmethod
    def interpolate(
        x: "FeatureVector", y: "FeatureVector", x_weight: float
    ) -> "FeatureVector":
        z = FeatureVector()
        for term in set(x.features) | set(y.features):
            z.add_feature_weight(
                term,
                F(
                    x_weight * float(x.get_feature_weight(term))
                    + (1.0 - x_weight) * float(y.get_feature_weight(term))
                ),
            )
        return z
