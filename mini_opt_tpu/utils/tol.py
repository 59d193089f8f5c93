"""Tolerance ladder used throughout the verification suite.

Mirror of the reference's test_utils tolerance constants
(/root/reference/test/test_utils.hpp:10-17).
"""

DECI = 1.0e-1
CENTI = 1.0e-2
MILLI = 1.0e-3
MICRO = 1.0e-6
NANO = 1.0e-9
PICO = 1.0e-12
