"""Minimal Bio package stub (biopython is not installed in this image).

Only provides what reference jasper.py imports: pairwise2.align.globalms and
format_alignment. Both the oracle run and the jasper_tpu engine use the same
underlying aligner, so golden comparisons are consistent.
"""
