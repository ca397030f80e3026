package graft.internal;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Bridge from a Catalyst {@link Expression} to a user-facing {@link Column}.
 *
 * Spark 4 made {@code Column(expr)} and {@code ExpressionUtils.column}
 * Scala-{@code private[sql]}; the JVM-level method is public static, so a
 * Java call site (which ignores Scala access signatures) is the supported
 * escape hatch — same trick the frameless/sedona ecosystems use. Keeping it
 * in one shim confines the API risk to a single line.
 */
public final class Cols {
    private Cols() {}

    public static Column of(Expression e) {
        return org.apache.spark.sql.classic.ExpressionUtils.column(e);
    }

    public static Expression expressionOf(Column c) {
        return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
    }
}
