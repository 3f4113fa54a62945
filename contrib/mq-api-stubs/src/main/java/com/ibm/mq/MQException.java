package com.ibm.mq;

/**
 * OFFLINE COMPILE-CHECK STUB — shape of the public IBM MQ client API
 * (the publicly documented MQI surface), used ONLY to compile-verify
 * contrib/ibmmq-client in the zero-egress build
 * (sbt -Dgraft.mqstub=true). No logic beyond "no broker here": never
 * package or deploy; with the real com.ibm.mq.allclient jar on the
 * classpath this source set must be absent.
 */
public class MQException extends Exception {
    public int completionCode;
    public int reasonCode;

    public MQException(int completionCode, int reasonCode, String message) {
        super(message + " [CC=" + completionCode + " RC=" + reasonCode + "]");
        this.completionCode = completionCode;
        this.reasonCode = reasonCode;
    }
}
