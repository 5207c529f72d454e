"""PySpark-native e-commerce analytics engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference pipeline
``Ann-Vanessa2/Real-Time-Event-Driven-Data-Pipeline-for-an-E-Commerce-shop``
(surveyed in ``SURVEY.md``): validation of raw product/order/order-item
feeds, item-grain star-schema joins, daily Category/Order KPIs, an
event-driven (Structured Streaming) execution mode, and large-scale
extension operators (dedup, similarity search, text analysis,
multimodal columns) designed for a 1000-executor / 100 TB target.

Everything is expressed through the DataFrame/SQL API so Catalyst owns
pushdown, pruning and join selection; Python UDFs appear only in the
extension operators where built-ins cannot express the semantics, and
then always as Arrow-vectorized pandas UDFs.
"""

from .session import get_spark

__all__ = ["get_spark"]
