"""bench.py stdout contract: the driver records only the LAST 2000 chars of
stdout and json-parses them, so the one result line must stay under that
window even at worst-case number widths.  Rounds 3-7 overflowed it (the full
per-query map grew past 2 KB) and every BENCH_r{N}.json landed as
parsed:null — this pins the compact-line budget so it can never regress.
No Spark session needed: exercises the line builder on a synthetic result
shaped exactly like main()'s."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def _worst_case_result():
    # every timed query at a 5-digit wall (99999.999 s) — wider than any
    # real run can produce — plus full-width headline numbers
    qtimes = {name: 99999.999 for name in bench.BENCH_QUERY_NAMES}
    return {
        'metric': 'total bench wall seconds (headline pipeline + contract queries)',
        'value': 9999999.999,
        'unit': 'sec',
        'sf': 0.1,
        'queries': qtimes,
        'headline': {
            'pipeline': 'tokens -> SST(ika) -> rollup 1m/1h/1d -> gorilla blocks',
            'raw_points': 99999999999,
            'rolled_points': 99999999999,
            'wall_sec': 99999.999,
            'rolled_points_per_sec': 99999999.9,
            'raw_points_per_sec': 99999999.9,
            'compressed_bytes': 999999999999,
            'cpus': 32,
            'hw_probe_sec': 99.999,
            'hw_probe_mid_sec': 99.999,
            'hw_probe_post_sec': 99.999,
            'headline_normalized_pts_per_sec': 99999999.9,
            'headline_probe_used': 99.999,
            'headline_probe_rule': 'median(launch,mid,post)/0.30s',
            'stage_cpu_sec': {k: 99999.999 for k in
                              ('score', 'bucket', 'encode', 'assemble')},
            'stage_share': {k: 0.999 for k in
                            ('score', 'bucket', 'encode', 'assemble')},
        },
        'compression': {t: {'ts_dod_bytes_per_point': 99.999,
                            'gorilla_bytes_per_point': 99.999,
                            'scaled_int_bytes_per_point': 99.999}
                        for t in ('1m', '1h', '1d')},
        'rows': {name: 99999999999 for name in bench.BENCH_QUERY_NAMES},
    }


def test_stdout_line_fits_driver_tail_window():
    line = bench.compact_stdout_line(_worst_case_result())
    assert len(line) <= 1900
    assert '\n' not in line


def test_stdout_line_carries_driver_contract_fields():
    parsed = json.loads(bench.compact_stdout_line(_worst_case_result()))
    # the driver-spec surface: metric/value/unit/queries/sf
    for field in ('metric', 'value', 'unit', 'queries', 'sf'):
        assert field in parsed
    assert parsed['unit'] == 'sec'
    # every stdout query is a real benched query, and the headline kernels
    # are all present
    assert set(parsed['queries']) <= set(bench.BENCH_QUERY_NAMES)
    for must in ('sst_ika_scores', 'events_rollup_1m', 'events_continuous_agg'):
        assert must in parsed['queries']
    assert parsed['queries_timed'] == len(bench.BENCH_QUERY_NAMES)
    assert parsed['headline']['headline_probe_rule'] == 'median(launch,mid,post)/0.30s'


def test_stdout_subset_names_are_benched():
    missing = [n for n in bench._STDOUT_QUERIES
               if n not in bench.BENCH_QUERY_NAMES]
    assert not missing, f'stdout subset not in BENCH_QUERY_NAMES: {missing}'
