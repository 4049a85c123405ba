"""Domain kernel operators: audio codec/SNR/VAD (audio.py), batched
classification (classify.py). The Spark surface is Arrow-batched
pandas_udf / mapInPandas; backends are pluggable so deterministic
fakes drive tests while real models (silero/HF) slot in unchanged.
"""
