package graft.model

/** Typed exception taxonomy mirroring the reference's
  * `core/exceptions.py:1-55`, so error-handling code ported from the
  * reference maps catch-site for catch-site:
  *
  *   - SparkExpectOrFailException                      → [[DqRuleFailedException]] (DqModels.scala)
  *   - SparkExpectationsDataframeNotReturnedException  → [[DqDataFrameNotReturnedException]]
  *   - SparkExpectationsUserInputOrConfigInvalidException → [[DqUserInputOrConfigInvalidException]]
  *   - SparkExpectationsMiscException                  → [[DqMiscException]]
  *   - SparkExpectations{Slack,Teams,Zoom,PagerDuty,Email}…Exception
  *                                                     → [[DqNotificationException]] subtypes
  *   - SparkExpectationsErrorThresholdExceedsException → [[DqErrorThresholdExceedsException]]
  *   - SparkExpectationsInvalid{RuleType,RowDQ,AggDQ,QueryDQ}…Exception
  *                                                     → [[DqInvalidRuleTypeException]] /
  *                                                       expectation subtypes
  *
  * Hierarchy notes (deliberate deviations from the reference's flat
  * list, both strictly widening): the invalid-input family extends
  * `IllegalArgumentException` so existing generic catch sites keep
  * working, and the four invalid-rule types share
  * [[DqUserInputOrConfigInvalidException]] as parent so a ported
  * catch of the user-input class also traps the specific ones.
  */
class DqMiscException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** The wrapped user function (or caller) handed the engine something
  * that is not a DataFrame (reference expectations.py:1020-1024 — here,
  * a null input frame).
  */
final class DqDataFrameNotReturnedException(msg: String)
  extends RuntimeException(msg)

/** A configured rule or user-supplied value is invalid. */
class DqUserInputOrConfigInvalidException(msg: String)
  extends IllegalArgumentException(msg)

final class DqInvalidRuleTypeException(msg: String)
  extends DqUserInputOrConfigInvalidException(msg)
final class DqInvalidRowDqExpectationException(msg: String)
  extends DqUserInputOrConfigInvalidException(msg)
final class DqInvalidAggDqExpectationException(msg: String)
  extends DqUserInputOrConfigInvalidException(msg)
final class DqInvalidQueryDqExpectationException(msg: String)
  extends DqUserInputOrConfigInvalidException(msg)

/** Error percentage exceeded a configured threshold. */
final class DqErrorThresholdExceedsException(msg: String)
  extends RuntimeException(msg)

/** A notification channel failed to deliver; `channel` matches the
  * plugin name that threw.
  */
sealed class DqNotificationException(val channel: String, msg: String,
                                     cause: Throwable = null)
  extends RuntimeException(msg, cause)

final class DqSlackNotificationException(msg: String, cause: Throwable = null)
  extends DqNotificationException("slack", msg, cause)
final class DqTeamsNotificationException(msg: String, cause: Throwable = null)
  extends DqNotificationException("teams", msg, cause)
final class DqZoomNotificationException(msg: String, cause: Throwable = null)
  extends DqNotificationException("zoom", msg, cause)
final class DqPagerDutyException(msg: String, cause: Throwable = null)
  extends DqNotificationException("pagerduty", msg, cause)
final class DqEmailException(msg: String, cause: Throwable = null)
  extends DqNotificationException("email", msg, cause)

object DqNotificationException {
  /** Wrap a plugin-send failure in the channel's typed exception
    * (unknown channels keep the generic type).
    */
  def forChannel(channel: String, cause: Throwable): DqNotificationException = {
    val msg = s"error occurred while sending $channel notification: ${cause.getMessage}"
    channel match {
      case "slack"     => new DqSlackNotificationException(msg, cause)
      case "teams"     => new DqTeamsNotificationException(msg, cause)
      case "zoom"      => new DqZoomNotificationException(msg, cause)
      case "pagerduty" => new DqPagerDutyException(msg, cause)
      case "email"     => new DqEmailException(msg, cause)
      case other       => new DqNotificationException(other, msg, cause)
    }
  }
}
