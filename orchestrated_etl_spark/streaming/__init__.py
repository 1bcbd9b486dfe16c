"""Structured Streaming: the engine's analogue of the reference's 5-minute
Airflow cron (O1, /root/reference/dags/dag.py:29) and its arrival-dedup
(S4, dags/dag.py:97-98), plus the event-time operators the reference lacks
entirely (SURVEY §2.7): tumbling/sliding/session windows, watermarks,
late-data handling."""
