"""The reference dbt project (steam_analytics/) as a topologically-ordered
model registry of DataFrame builders: staging views → core marts → business
marts, plus the repaired stg_reviews (the reference model errors at runtime
— SURVEY §2.10 U2).
"""
