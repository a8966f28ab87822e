#!/usr/bin/env python3
"""Precision@20 over pred.txt rank positions (one per positive item)."""
import sys

K = 20
UNUM = 943
hits = sum(1 for line in open(sys.argv[1]) if int(line.strip()) < K)
print("Pre@%d:%.4f" % (K, hits / float(UNUM * K)))
