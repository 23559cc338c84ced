"""Experimental / negative-result modules.

Nothing here is selected by any production path.  Modules are kept because
the measurements they produced shape the design (docs/benchmarks.md), and
deleting them would erase the evidence for WHY the production paths look
the way they do.
"""
