from finetoo_sp_spark.plans.interpreter import PlanResult, execute_plan, parse_plan_json

__all__ = ["execute_plan", "parse_plan_json", "PlanResult"]
