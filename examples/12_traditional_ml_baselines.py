"""Train traditional ML models through the same API (reference example 07).

XGBoost (GBDT ranking/CTR), implicit-style ALS, and LightFM-style WARP all
consume the same schema'd Dataset. When the external libraries are absent the
adapters fall back to the built-in pure-numpy engines (same algorithms), so
this example runs anywhere.
"""

import models_tpu as mm
from models_tpu.baselines import ImplicitModel, LightFMModel
from models_tpu.xgb import XGBoost

train = mm.generate_data("e-commerce", num_rows=1500)
valid = mm.generate_data("e-commerce", num_rows=400)
schema = train.schema

# ---- gradient-boosted trees on the CTR target -----------------------------
gbdt = XGBoost(schema, objective="binary:logistic", target_column="click")
gbdt.fit(train, num_boost_round=10)
print("xgboost:", gbdt.evaluate(valid))

# ---- collaborative filtering on the user x item interactions --------------
als = ImplicitModel(schema, algo="als", factors=16, iterations=3)
als.fit(train)
print("als:", als.evaluate(valid, k=10))

warp = LightFMModel(schema, loss="warp", no_components=16)
warp.fit(train, epochs=2)
print("warp:", warp.evaluate(valid, k=10))
