"""PySpark-native analytics engine with the capabilities of the reference
transit big-data pipeline (codrutciulacu/Big-Data-Project) plus
LLM-training-data operators, designed for 100 TB scale.

See SURVEY.md for the full operator inventory.
"""

__version__ = "0.1.0"
