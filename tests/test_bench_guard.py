"""bench.py codegen-fallback guard: a janino compile failure in the JVM log
must become a named bench failure (round 6 shipped one at rc 0)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import codegen_failures

_PLANTED = """\
26/08/17 10:00:00 ERROR CodeGenerator: Failed to compile the generated Java code.
org.codehaus.commons.compiler.InternalCompilerException: Compiling "GeneratedClass": \
Code of method "sort_addToSorter_0()V" of class "GeneratedClass" grows beyond 64 KB
\tat org.codehaus.janino.UnitCompiler.compile2(UnitCompiler.java:402)
"""

_CLEAN = """\
26/08/17 10:00:00 WARN NativeCodeLoader: Unable to load native-hadoop library
{"metric": "bench_suite_total_sec", "value": 1.0}
"""


def test_planted_janino_stack_trips_guard():
    hits = codegen_failures(_PLANTED)
    assert len(hits) >= 2
    assert any("InternalCompilerException" in h for h in hits)


def test_clean_output_is_silent():
    assert codegen_failures(_CLEAN) == []
