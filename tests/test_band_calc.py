"""Pixel-for-pixel parity of band_calc against a masked-numpy oracle
replicating the reference kernel (processor_functions.py:112-160)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.operators.band_calc import band_calc
from remotior_sensus_spark.plans.expression import compile_expression, percentile_index
from remotior_sensus_spark.synth.generate import tile_pixel_values


def np_oracle(expr_np, arrays, nodata_mask="any"):
    """Replicates band_calculation: masked eval, bool->int, nodata write."""
    masks = [a == NODATA for a in arrays]
    stack = np.stack(masks)
    invalid = stack.any(axis=0) if nodata_mask == "any" else stack.all(axis=0)
    out = expr_np(*[a.astype(np.float64) for a in arrays])
    if out.dtype == bool:
        out = out.astype(float)
    out = out.astype(np.float64)
    out[invalid] = NODATA
    return out


@pytest.fixture(scope="module")
def tiles001(spark, geo001_dir):
    return spark.read.parquet(f"{geo001_dir}/tiles.parquet")


def _spark_pixels(df, n=5):
    rows = df.orderBy("tile_x", "tile_y").limit(n).collect()
    return {(r["tile_x"], r["tile_y"]): np.array(r["pixels"]) for r in rows}


def _ref_pixels(band_idx, tx, ty):
    return tile_pixel_values(0, band_idx, np.array([tx]), np.array([ty]))[0].astype(np.float64)


def test_ndvi_pixel_parity(tiles001):
    out = _spark_pixels(band_calc(tiles001, "#NDVI#"))
    for (tx, ty), got in out.items():
        nir = _ref_pixels(3, tx, ty)
        red = _ref_pixels(2, tx, ty)
        exp = np_oracle(lambda n, r: (n - r) / (n + r), [nir, red])
        assert np.array_equal(got, exp), (tx, ty)


def test_where_bool_cast(tiles001):
    out = _spark_pixels(band_calc(tiles001, 'where("B04" > 2500, 1, 0)'))
    for (tx, ty), got in out.items():
        red = _ref_pixels(2, tx, ty)
        exp = np_oracle(lambda r: np.where(r > 2500, 1.0, 0.0), [red])
        assert np.array_equal(got, exp)


def test_mask_mode_all(tiles001):
    out = _spark_pixels(band_calc(tiles001, '"B08" + "B04"', nodata_mask="all"))
    for (tx, ty), got in out.items():
        nir, red = _ref_pixels(3, tx, ty), _ref_pixels(2, tx, ty)
        exp = np_oracle(lambda a, b: a + b, [nir, red], nodata_mask="all")
        assert np.array_equal(got, exp)


def test_percentile_closest_observation():
    # mirror np.round half-even (processor_functions.py:94-96)
    for n in range(2, 8):
        for p in (0, 1, 25, 50, 80, 99, 100):
            assert percentile_index(n, p) == int(np.round((n - 1) * p / 100.0))


def test_percentile_expression_matches_numpy(tiles001):
    out = _spark_pixels(
        band_calc(tiles001, 'percentile([ "B02", "B03", "B04", "B08" ], 80)')
    )
    for (tx, ty), got in out.items():
        arrs = [_ref_pixels(i, tx, ty) for i in range(4)]

        def perc(*xs):
            st = np.stack(xs)
            idx = int(np.round((len(xs) - 1) * 0.8))
            return np.sort(st, axis=0)[idx]

        exp = np_oracle(perc, arrs)
        assert np.array_equal(got, exp)


def test_compile_errors():
    with pytest.raises(ValueError):
        compile_expression('frobnicate("B02")')
    with pytest.raises((ValueError, SyntaxError)):
        compile_expression('"B02" +')


def test_expression_variable_order():
    c = compile_expression('("B08" - "B04") / ("B08" + "B04")')
    assert c.variables == ["B08", "B04"]


class TestGrammar:
    """Parser/expansion unit tests for the band_calc grammar
    (ref tools/band_calc.py:598-1130, 1322-1336, 1358-1699)."""

    def test_nodata_folding(self):
        from remotior_sensus_spark.operators.band_calc import expand_calc_expression
        out = expand_calc_expression('where("B04" == nodata("B04"), 0, "B04")')
        assert "nodata" not in out
        assert "-32768.0" in out

    def test_star_current_bandset(self):
        from remotior_sensus_spark.operators.band_calc import expand_calc_expression
        out = expand_calc_expression('percentile("bandset#b*", 80)')
        assert out == ('percentile([ "bandset1b1", "bandset1b2", '
                       '"bandset1b3", "bandset1b4" ], 80)')

    def test_star_across_bandsets(self):
        from remotior_sensus_spark.operators.band_calc import expand_calc_expression
        out = expand_calc_expression('max("bandset*b2")')
        assert out == 'max([ "bandset1b2", "bandset2b2", "bandset3b2" ])'

    def test_brace_selection_ints_and_dates(self):
        from remotior_sensus_spark.operators.band_calc import expand_calc_expression
        assert expand_calc_expression('sum("bandset{1,3}b1")') == \
            'sum([ "bandset1b1", "bandset3b1" ])'
        assert expand_calc_expression('sum("bandset{1:2}b1")') == \
            'sum([ "bandset1b1", "bandset2b1" ])'
        assert expand_calc_expression(
            'sum("bandset{2020-01-02:2020-01-03}b1")') == \
            'sum([ "bandset2b1", "bandset3b1" ])'

    def test_spectral_alias_by_wavelength(self):
        from remotior_sensus_spark.operators.band_calc import resolve_var
        assert resolve_var("#BLUE#") == ("S2_2020-01-01", "B02")
        assert resolve_var("#GREEN#") == ("S2_2020-01-01", "B03")
        assert resolve_var("#RED#") == ("S2_2020-01-01", "B04")
        assert resolve_var("#NIR#") == ("S2_2020-01-01", "B08")

    def test_ordinal_band_refs(self):
        from remotior_sensus_spark.operators.band_calc import resolve_var
        assert resolve_var("bandset2b1") == ("S2_2020-01-02", "B02")
        assert resolve_var("bandset2bB04") == ("S2_2020-01-02", "B04")
        assert resolve_var("b3") == ("S2_2020-01-01", "B04")

    def test_forbandsets_iterator(self):
        from remotior_sensus_spark.operators.band_calc import parse_calc_script
        entries = parse_calc_script(
            'forbandsets[1:2]S\n"bandset#b1" * 2 @x%#')
        assert [(n, b) for _, n, b in entries] == [("x1", 1), ("x2", 2)]
        assert entries[0][0] == '"bandset1b1" * 2'

    def test_forbandsets_name_filter_excludes(self):
        from remotior_sensus_spark.operators.band_calc import parse_calc_script
        assert parse_calc_script('forbandsets[1:2]Z\n"bandset#b1"') == []

    def test_forbandsinbandset_band_variable(self):
        from remotior_sensus_spark.operators.band_calc import parse_calc_script
        entries = parse_calc_script(
            'forbandsinbandset[1]\n"#BAND#" + 1 @#BAND#')
        assert [n for _, n, _ in entries] == ["B02", "B03", "B04", "B08"]
        assert entries[2][0] == '"bandset1b3" + 1'

    def test_chained_output_names(self):
        from remotior_sensus_spark.operators.band_calc import parse_calc_script
        entries = parse_calc_script(
            '"bandset#b1" * 2 @t1\n"t1" + 1 @t2')
        assert entries[1][0] == '( "bandset1b1" * 2 ) + 1'

    def test_comment_lines_skipped(self):
        from remotior_sensus_spark.operators.band_calc import parse_calc_script
        entries = parse_calc_script('# a comment\n"bandset#b1" @out')
        assert len(entries) == 1 and entries[0][1] == "out"


# ---------------------------------------------------------------------------
# property-based fuzz: random expression trees, Spark plan vs direct numpy
# ---------------------------------------------------------------------------

try:
    from hypothesis import HealthCheck, assume, given, settings
    from hypothesis import strategies as hyp_st
    _HAVE_HYP = True
except Exception:  # pragma: no cover
    _HAVE_HYP = False

_FUZZ_BANDS = {"B02": 0, "B04": 2, "B08": 3}

if _HAVE_HYP:
    @hyp_st.composite
    def _expr_trees(draw):
        """(expr_string, numpy_fn, used_bands): the same tree rendered
        as band_calc grammar text and as a direct numpy evaluator.
        Division/log/exp are excluded on purpose — they introduce
        inf/NaN, and Spark SQL's NaN ordering semantics intentionally
        diverge from IEEE numpy (NaN > x is true in Spark); the masked
        nodata path never produces NaN for the ops generated here."""
        def node(d):
            if d == 0:
                if draw(hyp_st.integers(0, 3)) == 0:
                    v = float(draw(hyp_st.integers(-4, 4)))
                    return repr(v), (lambda env, v=v: v), set()
                b = draw(hyp_st.sampled_from(sorted(_FUZZ_BANDS)))
                return f'"{b}"', (lambda env, b=b: env[b]), {b}
            op = draw(hyp_st.sampled_from(
                ["+", "-", "*", "where", "sin", "cos", "abs", "sqrtabs"]))
            if op in ("+", "-", "*"):
                s1, f1, u1 = node(d - 1)
                s2, f2, u2 = node(d - 1)
                npf = {"+": np.add, "-": np.subtract,
                       "*": np.multiply}[op]
                return (f"({s1} {op} {s2})",
                        lambda env, f1=f1, f2=f2, npf=npf: npf(f1(env), f2(env)),
                        u1 | u2)
            if op == "where":
                c = draw(hyp_st.sampled_from([">", "<"]))
                s1, f1, u1 = node(d - 1)
                s2, f2, u2 = node(d - 1)
                s3, f3, u3 = node(d - 1)
                s4, f4, u4 = node(d - 1)
                npc = np.greater if c == ">" else np.less
                return (f"where({s1} {c} {s2}, {s3}, {s4})",
                        lambda env, f1=f1, f2=f2, f3=f3, f4=f4, npc=npc:
                        np.where(npc(f1(env), f2(env)), f3(env), f4(env)),
                        u1 | u2 | u3 | u4)
            s, f, u = node(d - 1)
            if op == "sqrtabs":
                return (f"sqrt(abs({s}))",
                        lambda env, f=f: np.sqrt(np.abs(f(env))), u)
            npf = {"sin": np.sin, "cos": np.cos, "abs": np.abs}[op]
            return f"{op}({s})", (lambda env, f=f, npf=npf: npf(f(env))), u

        s, f, u = node(draw(hyp_st.integers(1, 3)))
        assume(u)  # constants-only trees have no mask semantics to check
        return s, f, u

    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(tree=_expr_trees())
    def test_fuzz_expression_matches_numpy(spark, geo001_dir, tree):
        expr, npf, used = tree
        tiles = spark.read.parquet(f"{geo001_dir}/tiles.parquet")
        got = _spark_pixels(band_calc(tiles, expr), n=3)
        assert got, "no output tiles"
        for (tx, ty), g in got.items():
            env = {b: _ref_pixels(i, tx, ty) for b, i in _FUZZ_BANDS.items()}
            out = np.asarray(npf(env), dtype=np.float64)
            if out.shape == ():  # scalar-broadcast tree over used bands
                out = np.full(next(iter(env.values())).shape, float(out))
            invalid = np.zeros(out.shape, dtype=bool)
            for b in used:
                invalid |= env[b] == NODATA
            out = out.copy()
            out[invalid] = NODATA
            assert np.allclose(g, out, rtol=1e-12, atol=1e-9, equal_nan=True), \
                f"{expr} diverged at tile ({tx},{ty})"
