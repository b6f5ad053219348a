#!/usr/bin/env python3
"""Machine-derive the round close-gate record (GATE_rNN.json).

The round-5 close commits hand-transcribed test counts (claimed 438 then
442; the suite ran 425) — this tool exists so the gate line is scraped
from the tooling's own outputs instead:

  - test count + pass/fail from an `sbt test` log
    ("Total number of tests run: N", "Tests: succeeded N, failed N, ...")
  - query count   = the <name>.parquet dumps graft.Verify wrote
  - oracled count = entries in the oracle_sql.json graft.Verify wrote
  - per-query bench map = the self-contained bench_out.json line
    (BENCH_rNN.json's stdout tail truncates mid-JSON; this embeds the
    full line so the driver-side record stops being the only copy)
  - git HEAD at generation time

Usage:
  python3 tools/make_gate.py ROUND SBT_TEST_LOG VERIFY_OUT_DIR [BENCH_JSON]
e.g.
  sbt test 2>&1 | tee /tmp/sbt_test.log
  python3 tools/make_gate.py 6 /tmp/sbt_test.log /tmp/verify_out bench_out.json
"""
import json, os, re, subprocess, sys

def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    rnd = int(sys.argv[1])
    log_path, verify_dir = sys.argv[2], sys.argv[3]
    bench_path = sys.argv[4] if len(sys.argv) > 4 else 'bench_out.json'

    log = open(log_path, errors='replace').read()
    m_total = re.findall(r'Total number of tests run: (\d+)', log)
    m_counts = re.findall(
        r'Tests: succeeded (\d+), failed (\d+), canceled (\d+), '
        r'ignored (\d+), pending (\d+)', log)
    if not m_total or not m_counts:
        sys.exit(f'no scalatest summary in {log_path}')
    # the LAST summary block is the full run's
    tests_run = int(m_total[-1])
    succeeded, failed, canceled, ignored, pending = map(int, m_counts[-1])

    # Verify writes each query's result as a bare <name> directory
    # (parquet dataset), plus oracle_sql.json alongside
    dumps = sorted(d for d in os.listdir(verify_dir)
                   if d.startswith('q_')
                   and os.path.isdir(os.path.join(verify_dir, d)))
    oracle = json.load(open(os.path.join(verify_dir, 'oracle_sql.json')))
    no_oracle = sorted(set(dumps) - set(oracle))

    bench = None
    if os.path.exists(bench_path):
        bench = json.loads(open(bench_path).read().strip())
        # A partial sweep is a failed sweep (round 7 embedded -1.000
        # sentinels for 11 queries and PERF.md over-reported the total):
        # refuse to mint a gate from a bench map with unmeasured entries
        # or with registered queries missing from the sweep.
        bq = bench.get('queries', {})
        sentinels = sorted(k for k, v in bq.items() if v is None or v < 0)
        if sentinels:
            sys.exit(f'REFUSING to embed bench: unmeasured sentinel values '
                     f'for {sentinels} — re-run graft.Bench (it now retries '
                     f'failed/stolen queries in-run) until the map is clean')
        missing = sorted(set(dumps) - set(bq))
        if missing:
            sys.exit(f'REFUSING to embed bench: registered queries missing '
                     f'from the sweep: {missing} — the bench JSON predates '
                     f'the current catalog; re-run graft.Bench')

    head = subprocess.run(['git', 'rev-parse', 'HEAD'],
                          capture_output=True, text=True).stdout.strip()

    # The gate must describe HEAD (round 8's gate lagged it by one
    # test-only commit — tests landed after generation). Refuse when any
    # tracked SOURCE file is dirty: a gate minted then would describe a
    # tree no commit points at. Artifact files (GATE/BENCH/PERF/bench_out
    # etc.) may be dirty — the gate commit itself is expected to follow.
    porcelain = subprocess.run(['git', 'status', '--porcelain'],
                               capture_output=True, text=True).stdout
    dirty_src = sorted(l[3:] for l in porcelain.splitlines()
                       if l[3:].startswith(('src/', 'build.sbt', 'project/',
                                            'tools/')))
    if dirty_src:
        sys.exit(f'REFUSING to mint gate: uncommitted source changes '
                 f'{dirty_src} — commit first so git_head={head[:12]} '
                 f'actually describes the gated tree')

    # environment block: makes cross-round artifact archaeology (like the
    # round-6 DuckDB `//` division-direction hunt) start from facts
    def probe(cmd):
        try:
            r = subprocess.run(cmd, capture_output=True, text=True)
            return (r.stdout + r.stderr).strip().splitlines()[0]
        except Exception as e:
            return f'probe_failed: {e}'
    try:
        import duckdb
        con = duckdb.connect()
        dver = duckdb.__version__
        intdiv = con.sql('SELECT -7 // 2').fetchone()[0]
    except Exception as e:
        dver, intdiv = f'probe_failed: {e}', None
    env = {
        'jdk': probe(['java', '-version']),
        'spark_version': probe(
            ['bash', '-c',
             'ls /opt/spark/jars/spark-sql_* 2>/dev/null | head -1']),
        'duckdb_version': dver,
        'duckdb_probe_minus7_div_2': intdiv,
        'duckdb_intdiv_toward_zero': (intdiv == -3) if intdiv is not None
                                     else None,
    }

    gate = {
        'round': rnd,
        'git_head': head,
        'env': env,
        'tests_run': tests_run,
        'tests_succeeded': succeeded,
        'tests_failed': failed,
        'tests_canceled': canceled,
        'tests_ignored': ignored,
        'tests_pending': pending,
        'queries_registered': len(dumps),
        'queries_oracled': len(oracle),
        'queries_no_oracle': no_oracle,
        'bench': bench,
    }
    out = f'GATE_r{rnd:02d}.json'
    with open(out, 'w') as f:
        json.dump(gate, f, indent=1)
        f.write('\n')
    print(f'{out}: {tests_run} tests ({failed} failed), '
          f'{len(dumps)} queries ({len(oracle)} oracled), '
          f'bench={"embedded" if bench else "ABSENT"}')

if __name__ == '__main__':
    main()
