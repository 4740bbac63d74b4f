"""Research / negative-result kernels, kept OUT of the production surface.

Modules here are validated, tested engineering records of optimization
attempts that did not beat the shipping kernels (each module's docstring
carries the measurements and the roofline argument).  Nothing in the
production package imports from this namespace; docs/PERFORMANCE.md
summarizes the conclusions.
"""
