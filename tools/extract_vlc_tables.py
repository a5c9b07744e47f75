#!/usr/bin/env python3
"""Extract the HTJ2K CxtVLC code tables into a compact .npz data file.

The CxtVLC tables are normative constants from ITU-T T.814 (HTJ2K),
Annex C (Tables C.4/C.5): for every (context, significance-pattern,
u-offset, EMB patterns) they give the VLC codeword and its length.
Any conformant HTJ2K codec must embed exactly this data.

The reference implementation keeps the same data as C initializer lists
(/root/reference/src/core/coding/table0.h and table1.h, each row being
{c_q, rho, u_off, e_k, e_1, cwd, cwd_len}).  This script parses those
rows and stores them as a [N, 7] uint16 array per table in
openjph_tpu/coding/data/vlc_tables.npz, which is committed to the repo
so the framework is standalone.
"""
import re
import sys
import numpy as np

def parse(path):
    rows = []
    pat = re.compile(r"\{([^}]*)\}")
    with open(path) as f:
        for m in pat.finditer(f.read()):
            parts = [p.strip() for p in m.group(1).split(',')]
            if len(parts) != 7:
                continue
            rows.append([int(p, 0) for p in parts])
    return np.array(rows, dtype=np.uint16)

def main():
    ref = sys.argv[1] if len(sys.argv) > 1 else '/root/reference/src/core/coding'
    t0 = parse(f'{ref}/table0.h')
    t1 = parse(f'{ref}/table1.h')
    out = 'openjph_tpu/coding/data/vlc_tables.npz'
    np.savez_compressed(out, table0=t0, table1=t1)
    print(f'wrote {out}: table0 {t0.shape}, table1 {t1.shape}')

if __name__ == '__main__':
    main()
