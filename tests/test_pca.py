"""PCA invariants beyond oracle parity (tests the MATH, not just the
cross-engine replay): orthonormal basis, descending positive spectrum,
projected variance = eigenvalue, and the large-d mapInPandas Gram path
agreeing with the JVM aggregate pass.
"""

from __future__ import annotations

import math

import pytest

from opc_ua_data_pipeline_spark.operators.pca import (
    EMBED_DIM,
    embedding_covariance,
    gram_partials_pandas,
    pca_basis,
    pca_project,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF = "/root/testdata/sf0.01"

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def basis(spark):
    return pca_basis(spark, SF)


def test_covariance_matches_numpy(spark):
    import numpy as np

    emb = load_table(spark, SF, "embeddings").select("embedding").collect()
    m = np.stack([r["embedding"] for r in emb]).astype(np.float64)
    ref = np.cov(m, rowvar=False, bias=True)  # population, like the op
    got = embedding_covariance(
        load_table(spark, SF, "embeddings")
    ).collect()
    assert len(got) == EMBED_DIM * (EMBED_DIM + 1) // 2
    for r in got:
        # DECIMAL(38,6) term quantization bounds the drift at ~1e-6
        assert r["cov"] == pytest.approx(ref[r["i"], r["j"]], abs=5e-6)


def test_basis_is_orthonormal_with_descending_spectrum(spark, basis):
    import numpy as np

    means, comps, eigs = basis
    k, d = len(comps), len(comps[0])
    for a in range(k):
        for b in range(k):
            dot = sum(comps[a][i] * comps[b][i] for i in range(d))
            assert dot == pytest.approx(1.0 if a == b else 0.0, abs=1e-8)
    assert all(e > 0 for e in eigs)
    # the driver corpus's spectrum is nearly flat (adjacent ratios
    # ~0.99), so orthogonal iteration may land adjacent components a
    # hair out of order — require near-descending, and every Rayleigh
    # inside the true spectrum
    for a, b in zip(eigs, eigs[1:]):
        assert b <= a * 1.05
    m = np.stack(
        [
            r["embedding"]
            for r in load_table(spark, SF, "embeddings")
            .select("embedding")
            .collect()
        ]
    ).astype(np.float64)
    spectrum = np.linalg.eigvalsh(np.cov(m, rowvar=False, bias=True))
    assert all(e <= float(spectrum.max()) * (1 + 1e-9) for e in eigs)
    assert all(e >= float(spectrum.min()) for e in eigs)


def test_projected_variance_equals_eigenvalue(spark, basis):
    import numpy as np

    _, _, eigs = basis
    rows = pca_project(spark, SF).collect()
    by_comp: dict[int, list[float]] = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r["val"])
    for c, eig in enumerate(eigs):
        vals = np.array(by_comp[c])
        var = float((vals**2).mean())  # mean-centered projection
        assert var == pytest.approx(eig, rel=1e-3), c
        # and the projections themselves are centered
        assert abs(float(vals.mean())) < 1e-6


def test_gram_partials_match_aggregate_pass(spark):
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in gram_partials_pandas(
            load_table(spark, SF, "embeddings")
        ).collect()
    }
    ref = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(
            load_table(spark, SF, "embeddings")
        ).collect()
    }
    assert set(got) == set(ref)
    for k, v in ref.items():
        assert got[k] == pytest.approx(v, abs=5e-6), k
