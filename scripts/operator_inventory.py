#!/usr/bin/env python
"""Render docs/OPERATORS.md: the contract-query inventory with oracle
status and row counts, generated from CORRECTNESS_SELF.json (run
scripts/correctness_report.py first)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    with open('CORRECTNESS_SELF.json') as f:
        report = json.load(f)
    import __spark_entry__ as entry
    oracles = set(entry.oracle_sql())
    rows = []
    for name in entry.queries():
        r = report.get(name, {})
        if r.get('err') == 'no_oracle':
            status = ('frozen-hash-green' if r.get('hash_match')
                      else 'rows-only (documented)')
        else:
            status = ('DuckDB hash-green' if r.get('hash_match')
                      else 'NOT IN LAST REPORT' if not r else 'FAILING')
        rows.append((name, 'yes' if name in oracles else 'no',
                     r.get('spark_rows', '-'), status))
    n_green = sum(1 for r in rows if r[3] == 'DuckDB hash-green')
    n_frozen = sum(1 for r in rows if r[3] == 'frozen-hash-green')
    lines = [
        '# Contract-query inventory',
        '',
        f'{len(rows)} queries; {n_green} independently VERIFIED (DuckDB-oracled',
        f'hash-green) and {n_frozen} pinned by FROZEN REGRESSION HASHES',
        '(kernel/multimodal queries with no SQL-expressible oracle; registry',
        'tests/goldens/rowsonly_value_hashes.json — seeded from the',
        "implementation's own output, so they guard against drift, not a",
        'bug present at freeze time; those queries lean on the kernel',
        'goldens + pytest suites for verification) in the last self-report',
        '(`CORRECTNESS_SELF.json`, sf0.01).  Regenerate with',
        '`python scripts/operator_inventory.py` after a correctness run.',
        '',
        '| query | oracle | rows@sf0.01 | status |',
        '|---|---|---|---|',
    ]
    for name, has_o, n, status in rows:
        lines.append(f'| {name} | {has_o} | {n} | {status} |')
    os.makedirs('docs', exist_ok=True)
    with open('docs/OPERATORS.md', 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print(f'docs/OPERATORS.md: {len(rows)} queries, {n_green} green')


if __name__ == '__main__':
    main()
