#!/usr/bin/env python3
"""Generate a synthetic raw S3-access-log day for write-path profiling.

Usage: gen_raw_day.py <out_root> <bucket> <dt> <files> <lines_per_file>

Line grammar follows FIXTURES.md §1 (the reference's 18-group regex):
mostly REST.GET.OBJECT/REST.PUT.OBJECT lines with realistic-looking keys,
a sprinkle of all-sentinel and corrupt lines to exercise the PERMISSIVE
channel. Deterministic (seed 42): re-running regenerates byte-identical
input, so timings are comparable across runs.
"""
import os
import random
import sys


def main():
    out_root, bucket, dt, n_files, n_lines = (
        sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]))
    rnd = random.Random(42)
    day_dir = os.path.join(out_root, bucket)
    os.makedirs(day_dir, exist_ok=True)
    owner = "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be"
    ops = ["REST.GET.OBJECT"] * 6 + ["REST.PUT.OBJECT"] * 3 + ["REST.HEAD.OBJECT"]
    svcs = ["frontend", "billing", "search", "ml_features", "audit"]
    dd, mm, yyyy = dt.split("-")[2], dt.split("-")[1], dt.split("-")[0]
    mon = ["", "Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
           "Aug", "Sep", "Oct", "Nov", "Dec"][int(mm)]
    for f in range(n_files):
        hh, mi, ss = f % 24, (f * 7) % 60, (f * 13) % 60
        name = f"{dt}-{hh:02d}-{mi:02d}-{ss:02d}-{f:08X}"
        with open(os.path.join(day_dir, name), "w") as fh:
            for i in range(n_lines):
                r = rnd.random()
                if r < 0.001:
                    fh.write("this line is corrupt and will not parse\n")
                    continue
                op = ops[rnd.randrange(len(ops))]
                svc = svcs[rnd.randrange(len(svcs))]
                key = f"logs/{svc}/{yyyy}/{mm}/{dd}/part-{rnd.randrange(50000):05d}.tgz"
                t = f"[{dd}/{mon}/{yyyy}:{(hh + i // 3600) % 24:02d}:{(mi + i // 60) % 60:02d}:{(ss + i) % 60:02d} +0000]"
                ip = f"10.{rnd.randrange(256)}.{rnd.randrange(256)}.{rnd.randrange(256)}"
                req_id = f"{rnd.getrandbits(64):016X}"
                requester = f"arn:aws:iam::123456789012:assumed-role/{svc}-role/i-{rnd.getrandbits(40):010x}"
                nbytes = rnd.randrange(100, 5_000_000)
                osize = nbytes if op != "REST.HEAD.OBJECT" else "-"
                total_t = rnd.randrange(1, 900)
                turn_t = rnd.randrange(1, total_t + 1)
                verb = "GET" if op.startswith("REST.GET") else (
                    "PUT" if op.startswith("REST.PUT") else "HEAD")
                fh.write(
                    f"{owner} {bucket} {t} {ip} {requester} {req_id} {op} {key} "
                    f'"{verb} /{key} HTTP/1.1" 200 - {nbytes} {osize} {total_t} {turn_t} '
                    f'"-" "aws-sdk-java/1.11" -\n')
    print(f"wrote {n_files} files x {n_lines} lines under {day_dir}")


if __name__ == "__main__":
    main()
